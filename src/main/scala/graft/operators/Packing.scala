package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-budget context windows,
  * the standard pre-training step ("concat then split every `budget`
  * tokens"). Deterministic given the ordering key: a document's pack is a
  * pure function of the cumulative token count before it, so output is
  * stable across partitionings and reruns.
  *
  * Scale posture: the cumulative sum is a window over `groupCols`. With
  * empty `groupCols` that is a single-partition global sort — correct but
  * driver-bounded, only for small corpora. At 100 TB ALWAYS pack within
  * groups (language, source shard, date bucket …): each group's window
  * sorts independently after one shuffle, which is also what training
  * wants (homogeneous packs, no cross-shard coupling).
  */
object Packing {

  /** Adds `start_offset` (tokens before this doc in its group's stream)
    * and `pack_id` (= start_offset div budget, scoped to the group). A doc
    * longer than `budget` starts in its assigned pack and spills into the
    * next — concat-and-split semantics, no doc is dropped.
    */
  def concatPack(
      df: DataFrame, orderBy: Seq[Column], tokens: Column, budget: Long,
      groupCols: Seq[Column] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset",
        coalesce(sum(tokens).over(w), lit(0L)).cast("long"))
      .withColumn("pack_id", expr(s"start_offset div ${budget}L"))
  }

  /** Pack utilization summary: docs per pack, tokens that START in the
    * pack, and the fill ratio against the budget (spill from a pack's last
    * doc lands in the next pack; `fill` can exceed 1.0 on the pack where a
    * long doc starts).
    */
  def packStats(
      packed: DataFrame, tokens: Column, budget: Long,
      groupCols: Seq[Column] = Nil): DataFrame =
    packed.groupBy(groupCols :+ col("pack_id"): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens).cast("long").as("n_tokens"),
        round(sum(tokens) / lit(budget.toDouble), 4).as("fill"))
}
