package graft

import graft.core.ErrorRows
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewErrorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val df = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "lineitem")
    val plain = df.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    val salted = Skew.saltedAgg(df, Seq(col("l_returnflag")), salts = 8,
      partial = Seq(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("q")),
      merge = Seq(sum(col("n")).as("n"), sum(col("q")).as("q")))
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(t => (t._1, t._2, t._3.doubleValue)).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a skewed key") {
    // 90% of facts share one key — the shape AQE can't fix for aggs.
    val fact = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (901 to 1000).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"label$i") }.toDF("key", "label")
    val plain = fact.join(dim, Seq("key")).select("key", "v", "label")
      .as[(String, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 16)
      .select("key", "v", "label").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 900)
  }

  test("error rows captured in-band; summary derives A4 statuses") {
    val df = Seq("2023-01-05", "garbage", "2024-02-29", "nope").toDF("raw")
      .withColumn("grp", when(col("raw").startsWith("2"), "g1").otherwise("g2"))
    val withS = ErrorRows.withStatus(df, col("raw"),
      graft.functions.DateFunctions.parseMultiFormat(col("raw")), "d")
    val (good, bad) = ErrorRows.partition(withS)
    assert(good.count() == 2)
    assert(bad.count() == 2)
    assert(bad.select("error").as[String].collect().forall(_.contains("failed to derive")))
    val sums = ErrorRows.summarize(withS, Seq(col("grp")))
      .select("grp", "run_status").as[(String, String)].collect().toMap
    assert(sums("g1") == "success")          // both dates parse
    assert(sums("g2") == "failed")           // both garbage
  }
}
