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

  // ---- portable count-min ---------------------------------------------------

  test("countMin: estimates always >= exact, equal when collision-free") {
    val items = (1L to 2000L).map(i => s"tok${i % 97}").toDF("w")
    val regs = Sketches.countMinRegisters(items, col("w"), depth = 3, width = 1024)
    val exact = items.groupBy("w").agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmEstimates(regs, exact, col("w"), depth = 3, width = 1024)
      .select("w", "exact_n", "cm_est").as[(String, Long, Long)].collect()
    assert(est.length == 97)
    est.foreach { case (w, ex, cm) => assert(cm >= ex, s"$w: $cm < $ex") }
    // 97 distinct items in 1024 slots x 3 rows: min-over-rows collision
    // residue must be tiny; demand exactness for >= 90 of 97
    assert(est.count { case (_, ex, cm) => cm == ex } >= 90, est.toSeq)
  }

  test("countMin registers: partition-independent and width-bounded") {
    val items = (1L to 5000L).map(i => s"w${i % 211}").toDF("w")
    val a = Sketches.countMinRegisters(items, col("w"), 2, 256)
      .as[(Int, Long, Long)].collect().toSet
    val b = Sketches.countMinRegisters(items.repartition(17), col("w"), 2, 256)
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.size <= 2 * 256)
    // sum via iterator — Set.map would dedup equal counts before summing
    assert(a.groupBy(_._1).view.mapValues(_.iterator.map(_._3).sum).toMap ==
      Map(0 -> 5000L, 1 -> 5000L)) // each row sees every item once
  }

  test("cmEstimates: duplicate probe rows keep multiplicity; cnt column safe") {
    val items = Seq("a", "a", "b").toDF("w")
    val regs = Sketches.countMinRegisters(items, col("w"), 2, 64)
    // probe frame carries its own `cnt` column AND a duplicated row
    val probes = Seq(("a", 9L), ("a", 9L), ("b", 1L)).toDF("w", "cnt")
    val out = Sketches.cmEstimates(regs, probes, col("w"), 2, 64)
      .select("w", "cnt", "cm_est").as[(String, Long, Long)].collect().toSeq
    assert(out.sortBy(r => (r._1, r._2)) ==
      Seq(("a", 9L, 2L), ("a", 9L, 2L), ("b", 1L, 1L)))
  }

  // ---- portable HLL ---------------------------------------------------------

  test("hllRegisters: partition-independent, bucket-bounded, rho in range") {
    val items = (1L to 3000L).map(i => ("g", s"v$i")).toDF("g", "w")
    val a = Sketches.hllRegisters(items, Seq(col("g")), col("w"), p = 6)
      .as[(String, Long, Int)].collect().toSet
    val b = Sketches.hllRegisters(items.repartition(13), Seq(col("g")), col("w"), p = 6)
      .as[(String, Long, Int)].collect().toSet
    assert(a == b && a.size <= 64)
    assert(a.forall { case (_, bkt, rho) => bkt >= 0 && bkt < 64 && rho >= 1 && rho <= 55 })
  }

  test("hllEstimate: within 3 sigma of exact cardinality at p=6") {
    // rsd = 1.04/sqrt(64) = 13%; 3 sigma = 39%
    for (n <- Seq(500L, 5000L)) {
      val items = (1L to n).map(i => ("g", s"item-$i-x")).toDF("g", "w")
      val regs = Sketches.hllRegisters(items, Seq(col("g")), col("w"), p = 6)
      val est = Sketches.hllEstimate(regs, Seq(col("g")), p = 6)
        .select("estimate").as[Double].head()
      assert(math.abs(est - n) / n <= 0.39, s"n=$n est=$est")
    }
  }

  test("hllMerge: merged shard registers == registers over the union") {
    val items = (1L to 4000L).map(i => (s"shard${i % 7}", s"val$i")).toDF("g", "w")
    val perShard = Sketches.hllRegisters(items, Seq(col("g")), col("w"), p = 6)
    val merged = Sketches.hllMerge(perShard, Nil)
      .as[(Long, Int)].collect().toSet
    val direct = Sketches.hllRegisters(items, Nil, col("w"), p = 6)
      .as[(Long, Int)].collect().toSet
    assert(merged == direct && merged.nonEmpty)
  }

  test("hllEstimate: linear-counting regime for tiny cardinalities") {
    val items = (1L to 12L).map(i => ("g", s"u$i")).toDF("g", "w")
    val regs = Sketches.hllRegisters(items, Seq(col("g")), col("w"), p = 6)
    val est = Sketches.hllEstimate(regs, Seq(col("g")), p = 6)
      .select("estimate").as[Double].head()
    assert(math.abs(est - 12.0) <= 3.0, s"est=$est")
  }

  test("register builders fail fast on reserved GROUP column names") {
    // same guard discipline as cmEstimates/sentenceChunks (ADVICE r7): a
    // groupCols OUTPUT named like an internal/output column would break
    // silently or ambiguously — but unrelated input columns with common
    // names are dropped by the first select and must NOT trip the guard
    val bad = Seq((1L, 2L, "x")).toDF("d", "bucket", "w")
    assertThrows[IllegalArgumentException] {
      Sketches.countMinRegisters(bad, col("w"), 2, 64, Seq(col("d")))
    }
    assertThrows[IllegalArgumentException] {
      Sketches.hllRegisters(bad, Seq(col("bucket")), col("w"), p = 6)
    }
    // the same frame is fine when the clashing names are not grouped
    val ok = Seq(("g", 9L, 8L, "x")).toDF("g", "d", "bucket", "w")
    assert(Sketches.countMinRegisters(ok, col("w"), 2, 64, Seq(col("g"))).count() > 0)
    assert(Sketches.hllRegisters(ok, Seq(col("g")), col("w"), p = 6).count() > 0)
  }
}
