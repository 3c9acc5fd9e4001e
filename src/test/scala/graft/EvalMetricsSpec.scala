package graft

import graft.functions.Log2Fixed
import graft.operators.{Divergence, EvalMetrics, TableOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranking metrics, Cohen's kappa, calibration/ECE (q220/q221/q224) plus
  * l-diversity (q222) and the Zipf slope (q223).
  */
class EvalMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def w(rank: Long): Long =
    1000000L * Log2Fixed.One / Log2Fixed(rank + 1)

  test("rankingMetrics: hand-checked recall/RR/nDCG, empty gold -> nulls") {
    val ranked = Seq(
      // q1: gold docs at ranks 1 and 3; 4 gold total
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      // q2: no gold doc retrieved at all
      (2L, 20L, 1), (2L, 21L, 2),
      // q3: gold set empty
      (3L, 30L, 1)).toDF("query_id", "doc_id", "rnk")
    val gold = Seq(
      (1L, 10L), (1L, 12L), (1L, 90L), (1L, 91L),
      (2L, 95L)).toDF("query_id", "doc_id")
    val got = EvalMetrics.rankingMetrics(ranked, gold, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.toString.toDouble),
          Option(r.get(4)).map(_.toString.toDouble),
          Option(r.get(5)).map(_.toString.toDouble))).toMap
    // q1: recall 2/4, RR = 1/1, nDCG = (w1+w3)/(w1+w2+w3+w4)
    val dcg = w(1) + w(3)
    val idcg = w(1) + w(2) + w(3) + w(4)
    val ndcg = ((2 * dcg * 1000000L + idcg) / (2 * idcg)).toDouble / 1e6
    assert(got(1L) == ((4L, 2L, Some(0.5), Some(1.0), Some(ndcg))))
    // q2: gold exists, nothing retrieved -> recall 0, RR 0, nDCG 0
    assert(got(2L) == ((1L, 0L, Some(0.0), Some(0.0), Some(0.0))))
    // q3: no gold -> metrics undefined
    assert(got(3L) == ((0L, 0L, None, None, None)))
  }

  test("rankingMetrics: ranks beyond k are ignored") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 4)).toDF("query_id", "doc_id", "rnk")
    val gold = Seq((1L, 11L)).toDF("query_id", "doc_id")
    val r3 = EvalMetrics.rankingMetrics(ranked, gold, k = 3).collect().head
    assert(r3.getLong(2) == 0L && r3.getDouble(3) == 0.0)
    val r5 = EvalMetrics.rankingMetrics(ranked, gold, k = 5).collect().head
    assert(r5.getLong(2) == 1L && r5.getDouble(3) == 1.0)
    // RR finds the rank-4 hit only when k admits it
    assert(r5.getDouble(4) == 0.25)
  }

  test("cohenKappa: known table, perfect agreement, constant rater -> null") {
    // classic example: n11=20 n10=5 n01=10 n00=15, kappa = 0.4
    val df = (Seq.fill(20)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(15)((0, 0))).toDF("a", "b")
    val r = EvalMetrics.cohenKappa(df, col("a"), col("b")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((20L, 5L, 10L, 15L)))
    assert(math.abs(r.getDouble(4) - 0.4) < 1e-9)
    val perfect = Seq((1, 1), (0, 0), (1, 1)).toDF("a", "b")
    assert(EvalMetrics.cohenKappa(perfect, col("a"), col("b"))
      .collect().head.getDouble(4) == 1.0)
    val constant = Seq((1, 1), (1, 1)).toDF("a", "b")
    assert(EvalMetrics.cohenKappa(constant, col("a"), col("b"))
      .collect().head.isNullAt(4))
  }

  test("calibrationBins: bin edges, means, accuracy, exact ECE") {
    // confDen 1000: conf .25 (bin 2) x2 labels {1,0}; conf .95 (bin 9) x1 label 1;
    // conf 1.0 clamps into bin 9
    val df = Seq((250L, 1), (250L, 0), (950L, 1), (1000L, 1))
      .toDF("c", "y")
    val got = EvalMetrics.calibrationBins(df, col("c"), 1000L, col("y"), 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got.keySet == Set(2L, 9L))
    // bin2: n=2 conf=0.25 acc=0.5 gap=|1*1000-500|=500
    assert(got(2L)._1 == 2L && got(2L)._2 == 0.25 && got(2L)._3 == 0.5 &&
      got(2L)._4 == 500L)
    // bin9: n=2 conf=0.975 acc=1.0 gap=|2*1000-1950|=50
    assert(got(9L)._1 == 2L && got(9L)._2 == 0.975 && got(9L)._3 == 1.0 &&
      got(9L)._4 == 50L)
    // ECE = (500+50)/(1000*4) = 0.1375, identical on both rows
    assert(got.values.map(_._5).toSet == Set(0.1375))
  }

  test("lDiversity: distinct counts, entropy, flags, reserved guard") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"), // uniform 2-way
      ("b", "x"), ("b", "x"), ("b", "x"),             // constant
      ("c", "x"), ("c", "y"), ("c", "z")              // uniform 3-way
    ).toDF("q", "s")
    val got = TableOps.lDiversity(df, Seq(col("q")), col("s"), l = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(got("a") == ((4L, 2L, 1.0, 1)))   // H(1/2,1/2) = 1 bit exactly
    assert(got("b") == ((3L, 1L, 0.0, 0)))   // constant -> 0 bits
    assert(got("c")._2 == 3L && got("c")._4 == 1)
    assert(math.abs(got("c")._3 - math.log(3) / math.log(2)) < 0.001)
    val e = intercept[IllegalArgumentException] {
      TableOps.lDiversity(df.withColumnRenamed("s", "diverse"),
        Seq(col("q")), col("diverse"), 2)
    }
    assert(e.getMessage.contains("diverse"))
  }

  test("zipfSlope: perfect power law recovers its exponent") {
    // freq(rank) = 2^(10-rank): slope in log2-log2 space vs log2(rank) is
    // NOT linear, so use freq = C / rank (slope -1): ranks 1,2,4,8 with
    // freq 64,32,16,8 -> y = lg(64/rank^?) ... use exact dyadic points:
    // tokens t1..t4 with counts 64,32,16,8 at ranks 1..4
    val rows = Seq(("s", "t1", 64), ("s", "t2", 32), ("s", "t3", 16),
      ("s", "t4", 8))
    val text = rows.map { case (_, t, n) => Seq.fill(n)(t).mkString(" ") }
      .mkString(" ")
    val df = Seq(("s", text)).toDF("source", "text")
    val got = Divergence.zipfSlope(df, col("source"), col("text"), topR = 4)
      .collect().head
    assert(got.getLong(1) == 4L)
    // freq halves per rank step but rank log-steps are uneven (1,2,3,4):
    // OLS over exact fixed-point logs; dyadic check: slope must be
    // negative and within the analytic OLS of the same points
    val xs = Seq(1L, 2L, 3L, 4L).map(r => Log2Fixed(r).toDouble)
    val ys = Seq(64L, 32L, 16L, 8L).map(f => Log2Fixed(f).toDouble)
    val n = 4.0
    val exp = (n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(got.getDouble(2) - exp) < 0.01, s"got $got expect $exp")
    assert(got.getDouble(2) < -1.0 && got.getDouble(2) > -2.0)
  }

  test("zipfSlope: single-type source -> null slope") {
    val df = Seq(("s", "only only only")).toDF("source", "text")
    val r = Divergence.zipfSlope(df, col("source"), col("text")).collect().head
    assert(r.getLong(1) == 1L && r.isNullAt(2))
  }
}
