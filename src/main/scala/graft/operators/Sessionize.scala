package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization and time bucketing (SURVEY.md §2.9 — the engine's
  * streaming-analog capability; the reference's only windowing is the
  * by-year / by-month output partitioning of registration records).
  *
  * Batch form here (lag + running sum — two window passes over ONE exchange
  * on the user key); the Structured Streaming form with watermarks lives in
  * graft.streaming.
  */
object Sessionize {

  /** Assign gap-based session ids: a new session starts when the gap from
    * the previous event of the same key exceeds `gapSeconds`.
    * Output adds `session_seq` (1-based per key).
    *
    * Gaps compare at MICROSECOND precision (`unix_micros`), the same
    * resolution as `session_window` / `StreamingOps.statefulSessions`
    * (strictly-greater in both), so this batch form is a true oracle for
    * the streaming form even on sub-second gap boundaries — whole-second
    * `unix_timestamp` would call a 30.1 s gap "same session" at gap=30 s
    * while the stream opens a new one.
    */
  def assignSessions(
      df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(ts.asc)
    val prev = lag(ts, 1).over(byKey)
    val isNew = when(
      prev.isNull ||
        (unix_micros(ts) - unix_micros(prev)) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_seq",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(
      df: DataFrame, key: Column, ts: Column, value: Column,
      gapSeconds: Long): DataFrame =
    assignSessions(df, key, ts, gapSeconds)
      .groupBy(key.as("key"), col("session_seq"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(value).as("value_sum"))

  /** Tumbling-window bucket label (batch analog of `window(ts, w)`). */
  def tumbling(ts: Column, width: String): Column = window(ts, width).getField("start")

  /** Running total with an explicit frame — the reference's scene-offset
    * accumulation (dify_transformation.py:105-168 — W3): each row's offset is
    * the sum of all PRIOR rows' durations within the partition.
    */
  def runningOffset(df: DataFrame, partition: Column, order: Column, duration: Column,
      zero: Column = lit(0.0)): DataFrame = {
    val w = Window.partitionBy(partition).orderBy(order.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("offset", coalesce(sum(duration).over(w), zero))
  }

  /** Absolute-vs-relative disambiguation (DIFYX:193-208): a raw subtitle time
    * already ≥ the scene offset is absolute; otherwise it's scene-relative.
    */
  def resolveAbsoluteTime(raw: Column, offset: Column): Column =
    when(raw >= offset, raw).otherwise(offset + raw)
}
