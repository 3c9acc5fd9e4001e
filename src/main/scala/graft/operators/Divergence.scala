package graft.operators

import graft.functions.{Log2Fixed, PolyHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source KL divergence of token distributions against the corpus —
  * the mixture-diagnostics statistic behind data-selection decisions:
  * which sources look like the blend and which pull it (domain shift,
  * contamination by boilerplate, a scrape gone wrong all show up as KL
  * spikes). KL(P_s ‖ P_corpus) in BITS:
  *
  *   Σ_w (c_sw/N_s) · log2( (c_sw/N_s) / (c_gw/N_g) )
  *     = (1/N_s) · Σ_w c_sw · (log2 c_sw + log2 N_g − log2 c_gw − log2 N_s)
  *
  * with every log the fixed-point [[Log2Fixed]] kernel — the sum is an
  * exact integer, the only float op is the final display division
  * (portable-half-up to 6dp). Every source token is in the corpus by
  * construction, so no zero denominators and no smoothing constant on
  * the hash surface.
  *
  * Scale posture: ONE corpus pass builds the (source, word-hash) count
  * table (localCheckpoint barrier — global counts and totals derive from
  * it, never from re-scans); everything after is (sources × vocabulary)-
  * bounded: the per-word global log table joins back on the 8-byte hash,
  * source totals ride a broadcast, and the per-row log2fp runs once per
  * (source, word) — never per token.
  */
object Divergence {

  /** (source, n_tokens, n_vocab, kl_bits 6dp) per distinct value of
    * `sourceCol`. Overflow envelope: |Σ c_sw·Δlg| ≤ N_s·64·2²⁰ — exact in
    * long to N_s ≈ 1.3·10¹¹ tokens per source; shard beyond.
    */
  def klBySource(df: DataFrame, sourceCol: Column, textCol: Column): DataFrame = {
    val cntS = df
      .select(sourceCol.as("source"),
        explode(PolyHash.polyGramHashes(df.sparkSession, textCol, 1)).as("h"))
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("c_sw"))
      .localCheckpoint()
    val cntG = cntS.groupBy(col("h"))
      .agg(sum(col("c_sw")).as("c_gw"))
      .select(col("h"), Log2Fixed.expr(col("c_gw")).as("__lg_gw"))
    val nS = cntS.groupBy(col("source"))
      .agg(sum(col("c_sw")).as("n_s"), count(lit(1)).as("n_vocab"))
      .select(col("source"), col("n_s"), col("n_vocab"),
        Log2Fixed.expr(col("n_s")).as("__lg_ns"))
    val nG = cntS.agg(sum(col("c_sw")).as("n_g"))
      .select(col("n_g"), Log2Fixed.expr(col("n_g")).as("__lg_ng"))
    cntS
      .join(cntG, Seq("h"))
      .join(broadcast(nS), Seq("source"))
      .crossJoin(broadcast(nG))
      .select(col("source"), col("n_s"), col("n_vocab"),
        (col("c_sw") * (Log2Fixed.expr(col("c_sw")) + col("__lg_ng") -
          col("__lg_gw") - col("__lg_ns"))).as("__term"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"), max(col("n_vocab")).as("n_vocab"),
        sum(col("__term")).as("__sum"))
      .select(col("source"), col("n_tokens"), col("n_vocab"),
        (floor(col("__sum").cast("double") /
          (col("n_tokens") * lit(Log2Fixed.One.toDouble)) * 1e6 + 0.5) / 1e6)
          .as("kl_bits"))
  }
}
