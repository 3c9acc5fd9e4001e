package graft

import graft.operators.{EvalMetrics, Journey}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Markov transitions (q230), lag correlation (q228) and the
  * two-proportion test (q229).
  */
class EventStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("markovTransitions: counts, per-source probabilities, tiebreaks") {
    // user 1: a b a b ; user 2: a b  -> a->b x3, b->a x1
    val ev = Seq(
      (1L, ts(10), 1L, "a"), (1L, ts(20), 2L, "b"),
      (1L, ts(30), 3L, "a"), (1L, ts(40), 4L, "b"),
      (2L, ts(10), 5L, "a"), (2L, ts(20), 6L, "b"),
      // same-ts tiebreak: event_id orders c BEFORE d
      (3L, ts(50), 7L, "c"), (3L, ts(50), 8L, "d")
    ).toDF("user_id", "t", "event_id", "sym")
    val got = Journey.markovTransitions(ev, col("user_id"), col("t"),
        col("event_id"), col("sym"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b")) == ((3L, 1.0)))
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got(("c", "d")) == ((1L, 1.0)))
    assert(!got.contains(("d", "c")))
  }

  test("lagCorrelation: planted lag-2 dependence found, r2 bounds") {
    // y(t) = x(t-2) exactly -> r2 = 1 at lag 2; x is a non-linear-in-t
    // series so other lags correlate weakly
    val xs = Seq(5L, 9L, 2L, 12L, 7L, 1L, 14L, 3L, 8L, 11L, 4L, 10L)
    val rows = xs.indices.map { t =>
      val y = if (t >= 2) xs(t - 2) else 99L
      (t.toLong, xs(t), y)
    }
    val df = rows.toDF("t", "x", "y")
    val got = Journey.lagCorrelation(df, col("t"), col("x"), col("y"), 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), Option(r.get(3)).map(_.toString.toDouble)))
      .toMap
    assert(got(2L)._3.contains(1.0) && got(2L)._2 == 1)
    assert(got(2L)._1 == 10L) // 12 points, lag 2 -> 10 pairs
    assert(got(0L)._3.exists(_ < 0.5))
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("lagCorrelation: zero-variance side yields null r2") {
    val df = (0L to 5L).map(t => (t, 7L, t)).toDF("t", "x", "y")
    val r = Journey.lagCorrelation(df, col("t"), col("x"), col("y"), 0)
      .collect().head
    assert(r.isNullAt(3) && r.getInt(2) == 0)
  }

  test("twoProportionTest: hand-checked z2, significance both ways") {
    // A: 100 users 50 convert; B: 100 users 80 convert
    // num = 50*100-80*100 = -3000; c=130, N=200
    // z2 = 3000^2 * 200 / (100*100*130*70) = 19.78... -> significant
    val big = ((1 to 100).map(i => (false, i <= 50)) ++
      (1 to 100).map(i => (true, i <= 80))).toDF("b", "conv")
    val r = EvalMetrics.twoProportionTest(big, col("b"), col("conv"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, 50L, 100L, 80L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.8)
    val z2 = 3000.0 * 3000 * 200 / (100.0 * 100 * 130 * 70)
    assert(math.abs(r.getDouble(6) - z2) < 1e-5)
    assert(r.getInt(7) == 1)
    // tiny imbalance -> not significant
    val small = ((1 to 100).map(i => (false, i <= 50)) ++
      (1 to 100).map(i => (true, i <= 52))).toDF("b", "conv")
    val r2 = EvalMetrics.twoProportionTest(small, col("b"), col("conv"))
      .collect().head
    assert(r2.getInt(7) == 0 && r2.getDouble(6) < 3.84)
  }

  test("twoProportionTest: degenerate cases -> null z2") {
    val allConv = Seq((false, true), (true, true)).toDF("b", "conv")
    assert(EvalMetrics.twoProportionTest(allConv, col("b"), col("conv"))
      .collect().head.isNullAt(6))
    val oneArm = Seq((false, true), (false, false)).toDF("b", "conv")
    val r = EvalMetrics.twoProportionTest(oneArm, col("b"), col("conv"))
      .collect().head
    assert(r.isNullAt(6) && r.isNullAt(5) && r.getDouble(4) == 0.5)
  }
}
