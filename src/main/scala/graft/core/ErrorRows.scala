package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-band error-row conventions (SURVEY.md §7 core module): the reference
  * encodes failures as rows, not exceptions — provider error rows
  * (多数据源获取链接.py:873-875), scrape status envelopes (DATA:1493-1495),
  * and the success/failed/partial summary (A4). In a distributed engine
  * this is the only shape that scales: a poisoned record must not kill a
  * 10^9-row job.
  *
  * Convention: every connector output carries
  *   status: string  ('success' | 'error')
  *   error:  string  (null on success)
  * and downstream stages filter with `ok` or route with `partition`.
  */
object ErrorRows {

  val StatusCol = "status"
  val ErrorCol = "error"

  /** Wrap a computed column, capturing nulls-on-failure as error rows:
    * `expr` is expected to be null-on-failure (the try_* family); rows
    * where `input` was present but `expr` came back null become errors.
    */
  def withStatus(df: DataFrame, input: Column, expr: Column, out: String): DataFrame =
    df.withColumn(out, expr)
      .withColumn(StatusCol,
        when(input.isNull || col(out).isNotNull, "success").otherwise("error"))
      .withColumn(ErrorCol,
        when(col(StatusCol) === "error",
          concat(lit(s"failed to derive $out from: "), substring(input, 1, 120))))

  /** Keep only clean rows (P13). */
  def ok(df: DataFrame): DataFrame = df.filter(col(StatusCol) === "success")

  /** Split into (success, error) without scanning twice at the caller. */
  def partition(df: DataFrame): (DataFrame, DataFrame) =
    (ok(df), df.filter(col(StatusCol) === "error"))

  /** A4 run summary: success/failed counts → status ∈ {success, failed,
    * partial_success, skipped} + human summary string.
    */
  def summarize(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        count(when(col(StatusCol) === "success", 1)).as("n_success"),
        count(when(col(StatusCol) === "error", 1)).as("n_error"))
      .withColumn("run_status",
        when(col("n_success") + col("n_error") === 0, "skipped")
          .when(col("n_error") === 0, "success")
          .when(col("n_success") === 0, "failed")
          .otherwise("partial_success"))
      .withColumn("summary",
        format_string("%d succeeded, %d failed", col("n_success"), col("n_error")))
}
