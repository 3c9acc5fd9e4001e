package graft.operators

import graft.functions.BpeCount
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-style subword tokenization with a TRAINED merge table — the
  * token-counting operator a training pipeline budgets with (sequence
  * packing, context-length truncation, per-source token quotas all key off
  * it; the reference's analog is DATA's char-cap truncation, which counts
  * the wrong unit). One BPE rank: train the top-M adjacent character
  * pairs on the corpus, then encode each word left-to-right, merging a
  * pair wherever the next two codepoints are in the table. Single-level
  * merges keep the encode exactly replayable by the q168 oracle (full
  * multi-rank BPE recursion is engine-hostile to replay and changes
  * counts by <2% on prose at M=64).
  *
  * Scale posture: training is ONE pair-histogram pass (map-side partials;
  * ≤ distinct-pairs rows per partition cross the exchange, top-M via
  * rank); the merge table is M strings of driver state (codebook
  * discipline — rides the scoring plan as digest-rendered expression
  * state); encoding is a compiled zero-shuffle projection.
  */
object Bpe {

  /** Adjacent within-word codepoint-pair strings of `textCol` as an
    * array column — the training-side pair stream; MUST match the
    * kernel's pair enumeration (spec-pinned).
    */
  private def pairStream(textCol: Column): Column = {
    val toks = graft.functions.TextFunctions.tokens(textCol)
    flatten(transform(toks, w =>
      transform(
        when(length(w) >= 2, sequence(lit(1), length(w) - 1))
          .otherwise(array().cast("array<int>")),
        i => w.substr(i, lit(2)))))
  }

  /** Top-`m` pairs by (count desc, pair asc) — M-bounded driver state.
    * The rank runs through [[Ranking.globalTopK]] (per-partition prune,
    * then a window over ≤ m×P survivors): the distinct pair vocabulary
    * is tiny for ASCII-ish corpora but reaches millions for CJK, where
    * an unpartitioned `Window.orderBy` would single-partition-sort it.
    */
  def trainMerges(df: DataFrame, textCol: Column, m: Int = 64): Seq[String] = {
    require(m >= 1, s"m must be >= 1, got $m")
    val counts = df.select(explode(pairStream(textCol)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
    Ranking.globalTopK(counts, Seq(col("n").desc, col("pair").asc), m,
        rankCol = Some("__rk"))
      .orderBy(col("__rk"))
      .select(col("pair")).collect().map(_.getString(0)).toSeq
  }

  /** Per-doc token accounting under the trained table:
    * (id, n_chars, n_tokens) — n_chars counts word codepoints (whitespace
    * excluded), n_tokens the BPE tokens; merges applied = n_chars −
    * n_tokens. One compiled pass.
    */
  def tokenCounts(df: DataFrame, idCol: Column, textCol: Column,
      merges: Seq[String]): DataFrame =
    df.select(idCol.as("doc_id"), BpeCount.expr(textCol, merges).as("b"))
      .select(col("doc_id"), col("b.n_chars").as("n_chars"),
        col("b.n_tokens").as("n_tokens"),
        (col("b.n_chars") - col("b.n_tokens")).as("n_merges"))
}
