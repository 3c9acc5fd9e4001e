package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level corpus curation (the RefinedWeb/C4 discipline): per-doc
  * quality verdicts rolled up to registrable-domain granularity, then
  * whole domains admitted or killed. Per-document filters miss systematic
  * junk — a template farm emits documents that each pass the row rules
  * while the domain is 95% boilerplate; conversely a reputable domain's
  * occasional short page shouldn't die alone. The standard move is:
  * aggregate the keep rate per eTLD+1 ([[graft.functions.TextFunctions.registrableDomain]]),
  * drop domains below a keep-rate bar (spam farms) or below a minimum
  * document count (no evidence either way ⇒ distrust), and keep a doc
  * iff its own flag AND its domain's verdict hold.
  *
  * All arithmetic is integer-exact: the keep rate is a floor permille
  * computed as `(n_keep·1000 − mod)/n_docs` (remainder-subtracted so the
  * double division is exact — DuckDB replays it as `//`), and the gates
  * compare integers.
  *
  * Scale posture: one domain-keyed hash agg (map-side partials; the frame
  * is domain-bounded, ~10⁷ rows for the open web — far under the corpus),
  * then one equi-join back on the domain key. The join is declared plain
  * so AQE broadcasts the stats side when it fits and falls back to a
  * shuffle join when a 100 TB crawl's domain table doesn't; no driver
  * state either way.
  */
object DomainCuration {

  /** Per-domain roll-up of a 0/1 keep flag:
    * (domain, n_docs, n_keep, keep_permille — floor).
    */
  def domainStats(docs: DataFrame, domainCol: Column,
      keepCol: Column): DataFrame =
    docs.groupBy(domainCol.as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(keepCol.cast("long")).as("n_keep"))
      .select(col("domain"), col("n_docs"), col("n_keep"),
        ((col("n_keep") * 1000 - pmod(col("n_keep") * 1000, col("n_docs"))) /
          col("n_docs")).cast("long").as("keep_permille"))

  /** Every doc with its domain verdict attached: input columns plus
    * `domain_docs`, `domain_keep_permille`, `domain_ok` (n_docs ≥ minDocs
    * AND keep_permille ≥ minKeepPermille) and `kept` (doc flag AND
    * domain_ok). Downstream: `.filter(col("kept") === 1)` for the curated
    * corpus; the full frame keeps the audit trail (which gate killed a
    * row) in-band.
    */
  def curate(docs: DataFrame, domainCol: Column, keepCol: Column,
      minDocs: Long, minKeepPermille: Long): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    require(minKeepPermille >= 0 && minKeepPermille <= 1000,
      s"minKeepPermille must be in [0,1000], got $minKeepPermille")
    val reserved = Seq("domain_docs", "domain_keep_permille", "domain_ok",
      "kept", "__stats_domain")
    require(!docs.columns.exists(reserved.contains),
      s"input carries a reserved output column: " +
        docs.columns.filter(reserved.contains).mkString(", "))
    val stats = domainStats(docs, domainCol, keepCol)
      .select(col("domain").as("__stats_domain"),
        col("n_docs").as("domain_docs"),
        col("keep_permille").as("domain_keep_permille"))
    // Null-safe join: docs whose domain is null (unparseable host — the
    // exact upstream failure an audit must surface) form their own stats
    // group and get a verdict like any other, instead of silently
    // vanishing from an inner equi-join.
    docs.join(stats, domainCol <=> col("__stats_domain"))
      .drop("__stats_domain")
      .withColumn("domain_ok",
        when(col("domain_docs") >= minDocs &&
          col("domain_keep_permille") >= minKeepPermille, 1).otherwise(0))
      .withColumn("kept",
        when(col("domain_ok") === 1 && keepCol === 1, 1).otherwise(0))
  }
}
