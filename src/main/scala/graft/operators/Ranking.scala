package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / dedup building blocks shared across the engine
  * (SURVEY.md §2.4 A7/A9, §2.5 W1/W2/W5).
  *
  * All of these are single-shuffle window plans: the exchange is on the
  * partition keys and the sort is local. At 100 TB the partition key is the
  * entity key (customer, chunk, user) — high cardinality, so no hot
  * partitions; nothing here ever collects to the driver.
  */
object Ranking {

  /** Top-k rows per group with a total deterministic order
    * (retrieve.py:352-387 — the per-task top_k slice, default 20).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Keep-first dedup: one row per key, first under `orderBy` wins.
    * Covers the reference's `used_chunk_ids` sequential dedup (J5), the
    * meta-cache precedence rule (A9: `api_detail` beats snapshot), and
    * order-preserving URL dedup (A7) — all are the same window shape once
    * iteration order is made an explicit column (SURVEY.md §7).
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Positional (rank-zip) join — J7: i-th row of `left` under `leftOrder`
    * matched to i-th row of `right` under `rightOrder`, within a shared
    * group key. Ordered positional join = row_number on both sides + equi
    * join on (group, rank); with both sides pre-partitioned on the group
    * key the join is co-located after the two window shuffles.
    */
  def positionalJoin(
      left: DataFrame, leftGroup: Seq[Column], leftOrder: Seq[Column],
      right: DataFrame, rightGroup: Seq[Column], rightOrder: Seq[Column],
      joinType: String = "inner"): DataFrame = {
    val lw = Window.partitionBy(leftGroup: _*).orderBy(leftOrder: _*)
    val rw = Window.partitionBy(rightGroup: _*).orderBy(rightOrder: _*)
    val l = left.withColumn("__pos", row_number().over(lw))
    val r = right.withColumn("__pos", row_number().over(rw))
    val cond = leftGroup.zip(rightGroup).map { case (a, b) => a === b }
      .reduce(_ && _) && l("__pos") === r("__pos")
    l.join(r, cond, joinType).drop("__pos")
  }
}
