package graft

import graft.core.Tables
import graft.operators.Rrf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries/oracles are contributed by the thematic modules under
  * graft.queries; this object just merges them.
  */
object SparkEntry {

  /** Flagship: the reference's retrieval pipeline shape (SURVEY.md §3.3) on
    * the synthetic tables — per-list ranking → RRF fusion → top-k → broadcast
    * enrichment — on sf=0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.load(spark, dir, "events")
    val cust = Tables.load(spark, dir, "customer")
    val perList = events.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sv"))
    Rrf.fuse(perList, col("event_type"), col("user_id"), col("sv"),
        k = 60, tiebreak = col("user_id"))
      .orderBy(col("rrf_score").desc, col("item").asc)
      .limit(20)
      .join(broadcast(cust), col("item") === cust("c_custkey"), "left")
      .select(col("item").as("user_id"), col("rrf_score"), col("n_lists"),
        col("c_name").as("user_name"))
  }

  private val modules: Seq[QueryModule] = Seq(
    new QueryModule(graft.queries.RelationalQueries.queries,
      graft.queries.RelationalQueries.oracles),
    new QueryModule(graft.queries.EventQueries.queries,
      graft.queries.EventQueries.oracles),
    new QueryModule(graft.queries.TemporalQueries.queries,
      graft.queries.TemporalQueries.oracles),
    new QueryModule(graft.queries.StringQueries.queries,
      graft.queries.StringQueries.oracles),
    new QueryModule(graft.queries.AnalyticsQueries.queries,
      graft.queries.AnalyticsQueries.oracles),
    new QueryModule(graft.queries.RetrievalQueries.queries,
      graft.queries.RetrievalQueries.oracles),
    new QueryModule(graft.queries.RuleQueries.queries,
      graft.queries.RuleQueries.oracles),
    new QueryModule(graft.queries.ExtendedQueries.queries,
      graft.queries.ExtendedQueries.oracles),
    new QueryModule(graft.queries.ScaleQueries.queries,
      graft.queries.ScaleQueries.oracles),
    new QueryModule(graft.queries.TrainingQueries.queries,
      graft.queries.TrainingQueries.oracles),
    new QueryModule(graft.queries.FixtureQueries.queries,
      graft.queries.FixtureQueries.oracles),
    new QueryModule(graft.queries.CurationQueries.queries,
      graft.queries.CurationQueries.oracles),
    new QueryModule(graft.queries.PipelineQueries.queries,
      graft.queries.PipelineQueries.oracles),
    new QueryModule(graft.queries.WarehouseQueries.queries,
      graft.queries.WarehouseQueries.oracles),
    new QueryModule(graft.queries.EvalQueries.queries,
      graft.queries.EvalQueries.oracles),
    new QueryModule(graft.queries.MiningQueries.queries,
      graft.queries.MiningQueries.oracles),
    new QueryModule(graft.queries.SketchQueries.queries,
      graft.queries.SketchQueries.oracles))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}

final class QueryModule(
    val queries: Map[String, (SparkSession, String) => DataFrame],
    val oracles: Map[String, String])
