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
    * Pass `rankCol` to keep the 1-based rank (avoids consumers recomputing
    * an identical window just to surface the position).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
      k: Int, rankCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val ranked = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    rankCol match {
      case Some(name) => ranked.withColumnRenamed("__rn", name)
      case None => ranked.drop("__rn")
    }
  }

  /** GLOBAL top-k with a total deterministic order (caller includes a
    * unique tiebreak in `orderBy`), safe at ANY k: per partition, a local
    * sort + `take(k)` in mapPartitions — zero exchanges by construction —
    * then the global rank over the ≤ k×P survivors. The declarative
    * rank-limit forms silently degrade to a FULL global sort of the input
    * once k crosses `spark.sql.optimizer.windowGroupLimitThreshold`
    * (1000) / `spark.sql.execution.topKSortFallbackThreshold` (10k) —
    * measured at 10M rows: 270 MB shuffled vs quota×partitions
    * (SCALE.md, DSIR receipt). The bounded final window is the
    * PlanGuard-exempt MapPartitions pattern.
    */
  def globalTopK(df: DataFrame, orderBy: Seq[Column], k: Int,
      rankCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sorted = df.sortWithinPartitions(orderBy: _*)
    val pruned = sorted.mapPartitions(_.take(k))(
      org.apache.spark.sql.Encoders.row(sorted.schema))
    val ranked = pruned
      .withColumn("__grk", row_number().over(Window.orderBy(orderBy: _*)))
      .filter(col("__grk") <= k)
    rankCol match {
      case Some(name) => ranked.withColumnRenamed("__grk", name)
      case None => ranked.drop("__grk")
    }
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
    * matched to i-th row of `right` under `rightOrder`, within shared group
    * key COLUMN NAMES (present on both sides — self-join safe: the right
    * side's non-key columns are suffixed `_r` to disambiguate lineage).
    * Ordered positional join = row_number on both sides + using-join on
    * (groupCols, rank); co-located after the two window shuffles.
    */
  def positionalJoin(
      left: DataFrame, right: DataFrame, groupCols: Seq[String],
      leftOrder: Seq[Column], rightOrder: Seq[Column],
      joinType: String = "inner"): DataFrame = {
    val lw = Window.partitionBy(groupCols.map(col): _*).orderBy(leftOrder: _*)
    val rw = Window.partitionBy(groupCols.map(col): _*).orderBy(rightOrder: _*)
    val l = left.withColumn("__pos", row_number().over(lw))
    val r = right.withColumn("__pos", row_number().over(rw))
    val rSafe = r.select(r.columns.map { c =>
      if (groupCols.contains(c) || c == "__pos") col(c) else col(c).as(c + "_r")
    }: _*)
    l.join(rSafe, groupCols :+ "__pos", joinType)
      .withColumnRenamed("__pos", "pos")
  }
}
