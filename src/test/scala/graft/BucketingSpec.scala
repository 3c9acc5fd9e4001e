package graft

import graft.core.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables join without a shuffle") {
    val dir = SparkTestSession.Sf0001
    val orders = graft.core.Tables.load(spark, dir, "orders")
    val lineitem = graft.core.Tables.load(spark, dir, "lineitem")

    // clean both metadata and any stale location from prior runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), "o_orderkey")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))

    // same row count as the plain join
    val plain = orders.join(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    assert(joined.agg(sum("n")).head().getLong(0) == plain.count())

    // and crucially: zero shuffle exchanges in the whole plan
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString.take(2000))
  }
}
