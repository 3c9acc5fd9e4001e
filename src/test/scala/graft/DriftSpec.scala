package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PSI drift (q225/q227) and the Benford first-digit audit (q226). */
class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("psiDrift: identical populations score ~0, a shifted one spikes") {
    // ref and cur identical across 2 bins -> every term 0 exactly
    val same = Seq((0, false), (0, true), (1, false), (1, true))
      .flatMap(Seq.fill(50)(_)).toDF("b", "cur")
    val s = Drift.psiDrift(same, Seq.empty, col("b"), col("cur"))
      .collect()
    assert(s.forall(_.getDouble(4) == 0.0))
    assert(s.forall(_.getDouble(3) == 0.0))
    // cur collapses to one bin -> strictly positive PSI, terms >= 0
    val moved = (Seq.fill(50)((0, false)) ++ Seq.fill(50)((1, false)) ++
      Seq.fill(100)((0, true))).toDF("b", "cur")
    val m = Drift.psiDrift(moved, Seq.empty, col("b"), col("cur")).collect()
    assert(m.forall(_.getDouble(3) >= 0.0))
    assert(m.head.getDouble(4) > 0.3, s"expected a spike: ${m.toSeq}")
  }

  test("psiDrift: hand-checked two-bin value with Laplace smoothing") {
    // ref: 3 in bin A, 1 in bin B; cur: 1 in A, 3 in B; L=1, B=2
    // p_A=4/6, q_A=2/6, p_B=2/6, q_B=4/6
    // PSI = 2 * (2/6) * log2(2) = 2/3 bits
    val df = (Seq.fill(3)(("A", false)) ++ Seq(("B", false)) ++
      Seq(("A", true)) ++ Seq.fill(3)(("B", true))).toDF("b", "cur")
    val got = Drift.psiDrift(df, Seq.empty, col("b"), col("cur"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("A")._1 == 3L && got("A")._2 == 1L)
    assert(math.abs(got("A")._4 - 2.0 / 3) < 1e-5)
    assert(math.abs(got("A")._3 - 1.0 / 3) < 1e-5) // per-bin term
    assert(got("A")._4 == got("B")._4)
  }

  test("psiDrift: grouped form computes per-group totals independently") {
    val df = (
      Seq.fill(10)(("g1", "x", false)) ++ Seq.fill(10)(("g1", "x", true)) ++
      Seq.fill(10)(("g2", "x", false)) ++ Seq.fill(10)(("g2", "y", true))
    ).toDF("g", "b", "cur")
    val got = Drift.psiDrift(df, Seq(col("g")), col("b"), col("cur"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(5)).toMap
    assert(got(("g1", "x")) == 0.0)
    assert(got(("g2", "x")) > 0.5 && got(("g2", "x")) == got(("g2", "y")))
  }

  test("psiDrift: reserved column guard") {
    val df = Seq((1, true)).toDF("psi_bits", "cur")
    val e = intercept[IllegalArgumentException] {
      Drift.psiDrift(df, Seq.empty, col("psi_bits"), col("cur"))
    }
    assert(e.getMessage.contains("psi_bits"))
  }

  test("benfordAudit: exact counts, zero-count digits present, TVD") {
    // 30, 300, 3000 -> digit 3 x3; 95 -> digit 9; 0 and -7 excluded
    val df = Seq(30L, 300L, 3000L, 95L, 0L, -7L).toDF("v")
    val got = Drift.benfordAudit(df, col("v"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got.keySet == (1 to 9).toSet)
    assert(got(3)._1 == 3L && got(9)._1 == 1L && got(1)._1 == 0L)
    assert(got(3)._2 == 0.75 && got(9)._2 == 0.25)
    // gap for digit 1: |0 - 4*301030| = 1204120
    assert(got(1)._4 == 1204120L)
    assert(math.abs(got(1)._3 - 0.30103) < 1e-9)
    // TVD identical on every row, equals sum(gap)/(2*4*1e6)
    val tvd = got.values.map(_._5).toSet
    assert(tvd.size == 1)
    val expected = {
      val gaps = got.values.map(_._4).sum
      ((2L * gaps * 1000000L + 8000000L) / 16000000L).toDouble / 1e6
    }
    assert(tvd.head == expected)
  }

  test("benfordAudit: a near-Benford sample scores far below a uniform one") {
    // powers of 2 equidistribute toward Benford (60 samples: TVD ~0.08);
    // a uniform 4-digit sample piles everything far from the law
    val pw = (0 until 60).map(i => Tuple1(1L << i)).toDF("v")
    val tvdPow = Drift.benfordAudit(pw, col("v")).collect().head.getDouble(5)
    val uni = (1000L until 1060L).map(Tuple1(_)).toDF("v") // all digit 1
    val tvdUni = Drift.benfordAudit(uni, col("v")).collect().head.getDouble(5)
    assert(tvdPow < 0.12, s"powers of two should be near-Benford, got $tvdPow")
    assert(tvdUni > 0.5 && tvdPow < tvdUni / 4,
      s"audit must separate: pow $tvdPow vs uniform $tvdUni")
  }

  /** Driver-side exact KS: max |cumR·nC − cumC·nR| / (nR·nC). */
  private def refKs(ref: Seq[Long], cur: Seq[Long]): (Double, Long) = {
    val vs = (ref ++ cur).distinct.sorted
    val nR = ref.size.toLong; val nC = cur.size.toLong
    var best = BigInt(0); var at = vs.head
    for (v <- vs) {
      val d = (BigInt(ref.count(_ <= v)) * nC - BigInt(cur.count(_ <= v)) * nR).abs
      if (d > best) { best = d; at = v }
    }
    val den = BigInt(nR) * nC
    (((best * 2000000 + den) / (den * 2)).toDouble / 1e6, at)
  }

  test("ksTest: matches the exact driver-side ECDF gap, with ties") {
    val rnd = new scala.util.Random(7)
    val ref = Seq.fill(300)(rnd.nextLong(50))  // heavy ties
    val cur = Seq.fill(200)(rnd.nextLong(50) + 10)
    val df = (ref.map(("g", _, false)) ++ cur.map(("g", _, true)))
      .toDF("g", "v", "cur")
    val out = Drift.ksTest(df, Seq(col("g")), col("v"), col("cur"))
      .collect().head
    val (ks, at) = refKs(ref, cur)
    assert(out.getAs[Long]("n_ref") == 300L)
    assert(out.getAs[Long]("n_cur") == 200L)
    assert(out.getAs[Double]("ks_stat") == ks)
    assert(out.getAs[Long]("ks_at") == at)
  }

  test("ksTest: identical samples -> 0/insignificant; disjoint -> " +
      "1/significant") {
    val same = (1L to 100L).flatMap(v => Seq(("g", v, false), ("g", v, true)))
      .toDF("g", "v", "cur")
    val s0 = Drift.ksTest(same, Seq(col("g")), col("v"), col("cur"))
      .collect().head
    assert(s0.getAs[Double]("ks_stat") == 0.0)
    assert(s0.getAs[Int]("significant") == 0)
    val disjoint = ((1L to 50L).map(("g", _, false)) ++
      (100L to 149L).map(("g", _, true))).toDF("g", "v", "cur")
    val s1 = Drift.ksTest(disjoint, Seq(col("g")), col("v"), col("cur"))
      .collect().head
    assert(s1.getAs[Double]("ks_stat") == 1.0)
    assert(s1.getAs[Int]("significant") == 1)
    // boundary sanity: D just below c(0.05)*sqrt((n+m)/nm) stays 0 —
    // two 100-sample arms need D > ~0.192
    val near = ((1L to 100L).map(("g", _, false)) ++
      (16L to 115L).map(("g", _, true))).toDF("g", "v", "cur")
    val sn = Drift.ksTest(near, Seq(col("g")), col("v"), col("cur"))
      .collect().head
    assert(sn.getAs[Double]("ks_stat") == 0.15)
    assert(sn.getAs[Int]("significant") == 0)
  }

  test("ksTest: null-flag rows are excluded from BOTH arms (the " +
      "kruskalWallis/brier convention), never counted as reference") {
    val flagged = (1L to 100L).flatMap(v =>
      Seq(("g", v, Some(false)), ("g", v, Some(true))))
    val nulls = (200L to 260L).map(v => ("g", v, None: Option[Boolean]))
    val df = (flagged ++ nulls).toDF("g", "v", "cur")
    val r = Drift.ksTest(df, Seq(col("g")), col("v"), col("cur"))
      .collect().head
    // with the nulls dropped the two arms are identical: n 100/100, D=0
    assert(r.getAs[Long]("n_ref") == 100L)
    assert(r.getAs[Long]("n_cur") == 100L)
    assert(r.getAs[Double]("ks_stat") == 0.0)
  }

  test("ksTest: a one-sided group reports null, never a number") {
    val df = (1L to 10L).map(("g", _, false)).toDF("g", "v", "cur")
    val r = Drift.ksTest(df, Seq(col("g")), col("v"), col("cur"))
      .collect().head
    assert(r.getAs[Long]("n_cur") == 0L)
    assert(r.getAs[Any]("ks_stat") == null)
    assert(r.getAs[Any]("ks_at") == null)
    intercept[IllegalArgumentException] {
      Drift.ksTest(df, Seq.empty, col("v"), col("cur"))
    }
  }
}
