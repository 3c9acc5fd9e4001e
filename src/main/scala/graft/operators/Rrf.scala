package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-Rank Fusion — the reference's core retrieval aggregation
  * (retrieve.py:153-181, SURVEY.md §2.4 A1): across per-query ranked lists,
  * `score(item) = Σ_lists 1/(k + rank)`, k=60, output ordered by fused score.
  *
  * Spark shape: one ranking window per list + one hash aggregation — partial
  * (map-side) aggregation halves the shuffle, and the only wide exchange is
  * on `itemCol`, which is high-cardinality and therefore skew-free. The
  * reference's "first-seen object representative" becomes an explicit
  * min_by on rank (deterministic, order-independent — SURVEY.md §7 hard
  * parts: we replace API-arrival order with a declared tiebreak).
  */
object Rrf {

  val DefaultK = 60

  /** @param df       one row per (list, item) candidate
    * @param listCol  ranked-list discriminator (the recall query id)
    * @param itemCol  fused entity (chunk id)
    * @param scoreCol within-list relevance, higher = better
    * @param tiebreak deterministic within-list tiebreak column
    */
  def fuse(
      df: DataFrame,
      listCol: Column,
      itemCol: Column,
      scoreCol: Column,
      k: Int = DefaultK,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(listCol).orderBy(scoreCol.desc, tiebreak.asc)
    df.withColumn("__rank", row_number().over(w))
      .groupBy(itemCol.as("item"))
      .agg(
        sum(lit(1.0) / (lit(k) + col("__rank"))).as("rrf_score"),
        count(lit(1)).as("n_lists"),
        min(col("__rank")).as("best_rank"))
  }
}
