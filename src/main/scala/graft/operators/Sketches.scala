package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate statistics — the 100 TB companion to the exact
  * forms the oracle checks. Exact distinct counts and exact percentiles
  * (q09/q61) shuffle every distinct value / sort every group; these
  * sketches keep per-group state CONSTANT (HLL++ registers, GK quantile
  * summaries), mergeable map-side, so profile jobs over the full corpus
  * cost one narrow pass + a tiny final merge regardless of input size.
  *
  * Engine-specific register layouts make sketch outputs
  * non-oracle-comparable by design; correctness is spec-bounded instead
  * (SketchesSpec: observed error within the configured bound vs the exact
  * answers on the synthetic tables).
  */
object Sketches {

  /** Per-group approximate distinct cardinality (HLL++).
    * @param rsd maximum relative standard deviation (default 2%).
    */
  def distinctProfile(
      df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Per-group approximate percentiles with bounded rank error:
    * `accuracy` trades state for precision (rank error ≤ 1/accuracy).
    */
  def quantileProfile(
      df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(valueCol,
          typedLit(percentiles), lit(accuracy)).as("approx_percentiles"),
        count(lit(1)).as("n_rows"))
}
