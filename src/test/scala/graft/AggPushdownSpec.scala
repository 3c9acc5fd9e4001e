package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 parquet aggregate-pushdown path behind q165: MIN/MAX/COUNT
  * answered from row-group statistics, never decoding data pages.
  */
class AggPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("q165: non-empty PushedAggregation in plan, values match the v1 aggregate") {
    val df = SparkEntry.queries("q165_agg_pushdown")(spark, SparkTestSession.Sf0001)
    val pushed = df.collect().head
    // A non-EMPTY PushedAggregation list: "PushedAggregation: []" means
    // the v2 path ran but every agg fell back to a data scan.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"), plan.take(2500))
    val plain = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "lineitem")
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")),
        min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice")))
      .collect().head
    assert(pushed.toSeq == plain.toSeq)
  }

  test("one unsupported aggregate type disables the whole pushdown") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    val df = graft.core.Tables.load(s2, SparkTestSession.Sf0001, "lineitem")
      .agg(count(lit(1)), min(col("l_shipdate")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: []"), plan.take(2500))
  }
}
