package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling: rank fetch candidates within
  * their registrable domain and deal them into WAVES such that no domain
  * is hit more than `perWave` times per wave — the fetch-side complement
  * of the q118 domain quota (which caps how much of a domain is KEPT;
  * this caps how fast it is FETCHED). Completes the crawl family:
  * sitemap discovery → robots gate (q120) → frontier waves (q212) →
  * domain quota (q118) → curation (q210).
  *
  * Deterministic by contract: rank = (priority desc, tiebreak asc)
  * within domain, wave = ⌈rank / perWave⌉ in exact integer arithmetic —
  * a scheduler replay on any engine produces the identical plan, which
  * is what makes crawl runs resumable and auditable.
  *
  * Scale posture: ONE domain-keyed window (partitioned — never global;
  * per-domain frontier size is bounded by the frontier refresh horizon),
  * then a narrow projection. Wave stats are a two-level hash agg.
  */
object Frontier {

  /** Adds `crawl_rank` (1-based within domain) and `wave` (1-based) to
    * the frontier frame.
    */
  def assignWaves(urls: DataFrame, domainCol: Column, priorityCol: Column,
      tiebreakCol: Column, perWave: Int): DataFrame = {
    require(perWave >= 1, s"perWave must be >= 1, got $perWave")
    val reserved = Seq("crawl_rank", "wave")
    require(!urls.columns.exists(reserved.contains),
      s"input carries a reserved output column: " +
        urls.columns.filter(reserved.contains).mkString(", "))
    val w = Window.partitionBy(domainCol)
      .orderBy(priorityCol.desc, tiebreakCol.asc)
    // (rank−1) div perWave via remainder subtraction: the double-backed
    // `/` is exact once the numerator is an exact multiple
    val rk = col("crawl_rank") - 1
    urls.withColumn("crawl_rank", row_number().over(w).cast("long"))
      .withColumn("wave",
        ((rk - pmod(rk, lit(perWave.toLong))) / perWave + 1).cast("long"))
  }

  /** Per-wave audit: (wave, n_urls, n_domains, max_per_domain). The
    * politeness invariant is `max_per_domain <= perWave` for every wave.
    */
  def waveStats(assigned: DataFrame, domainCol: Column): DataFrame = {
    val g1 = assigned.groupBy(col("wave"), domainCol.as("__d"))
      .agg(count(lit(1)).as("__n"))
    g1.groupBy(col("wave"))
      .agg(sum(col("__n")).as("n_urls"),
        count(lit(1)).as("n_domains"),
        max(col("__n")).as("max_per_domain"))
  }
}
