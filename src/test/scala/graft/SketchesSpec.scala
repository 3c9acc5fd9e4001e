package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch outputs are engine-specific (register layouts), so they are
  * error-BOUNDED against the exact answers rather than oracle-hashed.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events = graft.core.Tables
    .load(spark, SparkTestSession.Sf001, "events")

  test("approx distinct users per event type within the rsd bound") {
    val approx = Sketches.distinctProfile(
        events, Seq(col("event_type")), col("user_id"), rsd = 0.02)
      .select("event_type", "approx_distinct")
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, d) =>
      val rel = math.abs(approx(k) - d).toDouble / d
      assert(rel <= 0.05, s"$k: approx=${approx(k)} exact=$d rel=$rel")
    }
  }

  test("approx percentiles of event value within rank-error bound") {
    val n = events.count()
    val approx = Sketches.quantileProfile(
        events, Nil, col("value"), Seq(0.5, 0.9, 0.99), accuracy = 10000)
      .select("approx_percentiles").as[Seq[Double]].head()
    val exact = events.stat.approxQuantile("value", Array(0.5, 0.9, 0.99), 0.0)
    // rank error <= 1/accuracy: compare by the fraction of rows between
    // the approximate and exact cut points
    approx.zip(exact).zip(Seq(0.5, 0.9, 0.99)).foreach { case ((a, e), p) =>
      val lo = math.min(a, e); val hi = math.max(a, e)
      val between = events.filter(col("value") > lo && col("value") <= hi).count()
      assert(between.toDouble / n <= 2.0 / 10000 + 1e-9,
        s"p$p: approx=$a exact=$e strayed ${between.toDouble / n} of rank space")
    }
  }
}
