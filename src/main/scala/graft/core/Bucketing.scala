package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed chunk tables (SURVEY.md §7 100 TB posture: "bucketed writes for
  * chunk tables"). Writing both sides of a recurring join bucketed on the
  * join key makes the join shuffle-FREE forever after — the right call for
  * the chunk/metadata tables the retrieval pipeline joins on every query.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table on `key` (sorted within
    * buckets, so merge-joins skip the sort too).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing buys (used by tests and plan audits).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
