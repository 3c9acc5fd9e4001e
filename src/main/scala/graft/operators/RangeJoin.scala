package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed point-in-interval join — every point row `(key, time)` matched to
  * the interval rows `(key, start, end)` with `start <= time < end`
  * (half-open). The reference has no range shape (SURVEY §2.3 is all
  * equi/theta-containment); this is an engine extension for
  * event-window enrichment ("events in the 7 days before each order").
  *
  * A naive theta join (`pKey === iKey && iStart <= pTime && pTime < iEnd`)
  * lowers to BroadcastNestedLoop or a per-key cartesian — |points| ×
  * |intervals-per-key| comparisons, which at 100 TB is the plan that never
  * finishes. Here both sides are BINNED into fixed-width time buckets:
  * a point lands in exactly one bucket, an interval explodes to every
  * bucket it overlaps, and the join is a plain shuffled EQUI-join on
  * `(key, bucket)` refined by the exact predicate. Each qualifying pair
  * meets in exactly one bucket (the point's), so no post-dedup is needed.
  * Cost scales with interval_length / binWidth (buckets per interval);
  * pick `binWidth` on the order of the typical interval length so most
  * intervals explode to ≤ 2 rows.
  *
  * Bucket ids are computed with integral `div` on epoch micros — double
  * division could mis-floor on exact bucket boundaries and silently drop
  * boundary matches.
  */
object RangeJoin {

  /** @param joinType "inner" or "left_outer" (left = points).
    * @param binWidthSeconds bucket width; must be ≥ 1. Correct for ANY
    *                        width — only the explode factor changes.
    *
    * Point and interval frames must not share column names (assert below);
    * alias upstream as needed. All original columns from both sides are
    * carried through.
    */
  def pointInInterval(
      points: DataFrame, pKey: Column, pTime: Column,
      intervals: DataFrame, iKey: Column, iStart: Column, iEnd: Column,
      binWidthSeconds: Long, joinType: String = "inner"): DataFrame = {
    require(binWidthSeconds >= 1, "binWidthSeconds must be >= 1")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points/intervals share column names: ${overlap.mkString(", ")} — alias one side")
    val binUs = binWidthSeconds * 1000000L

    val p = points
      .withColumn("__p_us", unix_micros(pTime))
      .withColumn("__bin", expr(s"__p_us div ${binUs}L"))
    val i = intervals
      .withColumn("__s_us", unix_micros(iStart))
      .withColumn("__e_us", unix_micros(iEnd))
      // half-open [start, end): a point at exactly `end` never matches, so
      // the last bucket needed is the one containing end - 1µs
      .withColumn("__bin", explode(sequence(
        expr(s"__s_us div ${binUs}L"),
        expr(s"greatest(__s_us, __e_us - 1L) div ${binUs}L"))))

    p.join(i,
        p("__bin") === i("__bin") && pKey === iKey &&
          col("__s_us") <= col("__p_us") && col("__p_us") < col("__e_us"),
        joinType)
      .drop("__bin", "__p_us", "__s_us", "__e_us")
  }

  /** Keyed interval×interval OVERLAP join — pairs where
    * `s1 < e2 && s2 < e1` (half-open on both ends). Same binning scheme
    * as [[pointInInterval]], with the classic dedup rule for the
    * many-shared-buckets case: a qualifying pair is EMITTED only in the
    * bucket containing the overlap's start `max(s1, s2)` — every
    * overlapping pair meets there exactly once, so no distinct pass and
    * no pair ever double-counts. Degenerate intervals (`end <= start`,
    * i.e. empty half-open sets) are dropped from both sides before
    * binning — they can never have a non-empty intersection, and
    * without the filter a zero-length interval strictly inside another
    * would satisfy the strict-inequality predicate and be emitted.
    * Cost scales with interval span /
    * binWidth per side, never with per-key row count squared (the
    * per-key cartesian a theta join would run).
    */
  def intervalOverlap(
      left: DataFrame, lKey: Column, lStart: Column, lEnd: Column,
      right: DataFrame, rKey: Column, rStart: Column, rEnd: Column,
      binWidthSeconds: Long): DataFrame = {
    require(binWidthSeconds >= 1, "binWidthSeconds must be >= 1")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left/right share column names: ${overlap.mkString(", ")} — alias one side")
    val reserved = Seq("__bin", "__ls_us", "__le_us", "__rs_us", "__re_us")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"inputs must not carry reserved columns: ${clash.mkString(", ")}")
    val binUs = binWidthSeconds * 1000000L
    // degenerate intervals (end <= start) are empty half-open sets: a
    // zero-length interval strictly inside another would still satisfy
    // s1<e2 && s2<e1, emitting a pair with an EMPTY intersection (and
    // paying bin fan-out for it) — drop such rows before binning
    def binned(df: DataFrame, s: Column, e: Column, tag: String): DataFrame =
      df.where(unix_micros(e) > unix_micros(s))
        .withColumn(s"__${tag}s_us", unix_micros(s))
        .withColumn(s"__${tag}e_us", unix_micros(e))
        .withColumn("__bin", explode(sequence(
          expr(s"__${tag}s_us div ${binUs}L"),
          expr(s"greatest(__${tag}s_us, __${tag}e_us - 1L) div ${binUs}L"))))
    val l = binned(left, lStart, lEnd, "l")
    val r = binned(right, rStart, rEnd, "r")
    l.join(r,
        l("__bin") === r("__bin") && lKey === rKey &&
          col("__ls_us") < col("__re_us") && col("__rs_us") < col("__le_us") &&
          l("__bin") === expr(s"greatest(__ls_us, __rs_us) div ${binUs}L"),
        "inner")
      .drop("__bin", "__ls_us", "__le_us", "__rs_us", "__re_us")
  }

  /** Band join — points within ± `toleranceSeconds` of each other
    * (|leftTime − rightTime| ≤ tol, inclusive both ends), expressed as the
    * interval form with the right side expanded to `[t − tol, t + tol]`.
    */
  def band(
      left: DataFrame, lKey: Column, lTime: Column,
      right: DataFrame, rKey: Column, rTime: Column,
      toleranceSeconds: Long, joinType: String = "inner"): DataFrame = {
    val tolUs = toleranceSeconds * 1000000L
    val widened = right
      .withColumn("__band_s", timestamp_micros(unix_micros(rTime) - tolUs))
      // +1µs: pointInInterval is half-open, band is inclusive of t + tol
      .withColumn("__band_e", timestamp_micros(unix_micros(rTime) + tolUs + 1L))
    pointInInterval(left, lKey, lTime,
        widened, rKey, col("__band_s"), col("__band_e"),
        binWidthSeconds = math.max(1L, toleranceSeconds), joinType)
      .drop("__band_s", "__band_e")
  }
}
