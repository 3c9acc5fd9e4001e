package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QDigestCompress
import graft.operators.QuantileDigest

/** q-digest mergeable quantile sketch (operators/QuantileDigest.scala,
  * functions/QDigestCompress.scala) — kernel invariants, the rank-error
  * bound the 100 TB story rests on, the merge law, and fail-loud edges.
  */
class QuantileDigestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def leaves(vs: Seq[Long]): Array[(Int, Long, Long)] =
    vs.groupBy(identity).map { case (v, g) => (0, v, g.size.toLong) }.toArray

  // ---- kernel --------------------------------------------------------------

  test("kernel: empty input compresses to an empty digest") {
    assert(QDigestCompress.compress(Array.empty, 8, 4).isEmpty)
  }

  test("kernel: a single hot value stays a point-exact leaf") {
    val out = QDigestCompress.compress(Array((0, 42L, 1000L)), 8, 4)
    assert(out.toSeq === Seq((0, 42L, 1000L)))
  }

  test("kernel: mass is conserved and sizes obey the 3k bound") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(5000)(rnd.nextInt(1 << 12).toLong)
    for (k <- Seq(8, 32, 128)) {
      val out = QDigestCompress.compress(leaves(vs), 12, k)
      assert(out.map(_._3).sum === 5000L, s"mass lost at k=$k")
      assert(out.length <= 3 * k + 1, s"size ${out.length} > 3k+1 at k=$k")
      // kernel invariant: every internal node carries < t
      val t = math.max(1L, 5000L / k)
      out.filter(_._1 > 0).foreach { case (l, c, cnt) =>
        assert(cnt < t, s"internal node ($l,$c) carries $cnt >= t=$t") }
    }
  }

  test("kernel: canonical — input order never changes the digest") {
    val rnd = new scala.util.Random(11)
    val ns = leaves(Seq.fill(2000)(rnd.nextInt(1 << 10).toLong))
    val a = QDigestCompress.compress(ns, 10, 16).toSeq
    val b = QDigestCompress.compress(rnd.shuffle(ns.toSeq).toArray, 10, 16).toSeq
    assert(a === b)
  }

  test("kernel: fails loud on out-of-universe cells, never clamps") {
    intercept[IllegalArgumentException] {
      QDigestCompress.compress(Array((0, 256L, 1L)), 8, 4)
    }
    intercept[IllegalArgumentException] {
      QDigestCompress.compress(Array((0, -1L, 1L)), 8, 4)
    }
    intercept[IllegalArgumentException] {
      QDigestCompress.compress(Array((9, 0L, 1L)), 8, 4)
    }
  }

  // ---- rank-error bound ----------------------------------------------------

  /** For every q: est must truly cover the target rank (count(v <= est)
    * >= ceil(q n) — guaranteed, not approximate), and must not overshoot
    * by more than the t·bits straddler budget (count(v < est) < target +
    * t·bits).
    */
  private def assertQuantileBounds(
      vs: Seq[Long], bits: Int, k: Int, qs: Seq[Double]): Unit = {
    val df = vs.toDF("v").withColumn("g", lit("all"))
    val regs = QuantileDigest.registers(df, Seq(col("g")), col("v"), bits, k)
    val ans = QuantileDigest.quantiles(regs, Seq(col("g")), qs)
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    val n = vs.size.toLong
    val t = math.max(1L, n / k)
    val sorted = vs.sorted
    qs.foreach { q =>
      val est = ans(q)
      val target = math.ceil(q * n).toLong
      val nLe = sorted.count(_ <= est).toLong
      val nLt = sorted.count(_ < est).toLong
      assert(nLe >= target, s"q=$q est=$est covers only $nLe < $target")
      assert(nLt < target + t * bits,
        s"q=$q est=$est overshoots: $nLt >= $target + t*bits=${t * bits}")
    }
  }

  test("quantiles: rank error within t*bits on uniform data") {
    val rnd = new scala.util.Random(3)
    assertQuantileBounds(Seq.fill(4000)(rnd.nextInt(1 << 14).toLong),
      bits = 14, k = 64, qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0))
  }

  test("quantiles: rank error within t*bits on skewed data") {
    val rnd = new scala.util.Random(5)
    // zipf-ish: heavy mass on tiny values, long sparse tail
    val vs = Seq.fill(4000)(
      math.min((1 << 14) - 1, (math.exp(rnd.nextDouble() * 9) - 1).toLong))
    assertQuantileBounds(vs, bits = 14, k = 64,
      qs = Seq(0.1, 0.5, 0.9, 0.99))
  }

  // ---- merge law -----------------------------------------------------------

  test("merge: shard->merge digest obeys the bound at the combined t") {
    val rnd = new scala.util.Random(9)
    val vs = Seq.fill(6000)(rnd.nextInt(1 << 12).toLong)
    val df = vs.zipWithIndex
      .map { case (v, i) => (v, i % 5) }.toDF("v", "shard")
      .withColumn("g", lit("all"))
    val shardRegs = QuantileDigest.registers(
      df, Seq(col("g"), col("shard")), col("v"), 12, 64)
    val merged = QuantileDigest.merge(shardRegs, Seq(col("g")), 12, 64)
    // mass conservation through the merge
    assert(merged.agg(sum(col("cnt"))).as[Long].head() === 6000L)
    val ans = QuantileDigest.quantiles(merged, Seq(col("g")),
      Seq(0.25, 0.5, 0.9)).collect()
      .map(r => r.getDouble(1) -> r.getLong(2)).toMap
    val n = 6000L
    val t = math.max(1L, n / 64)
    val sorted = vs.sorted
    Seq(0.25, 0.5, 0.9).foreach { q =>
      val est = ans(q)
      val target = math.ceil(q * n).toLong
      assert(sorted.count(_ <= est) >= target)
      assert(sorted.count(_ < est) < target + t * 12)
    }
  }

  test("merge: associative-by-canonicalization — shard split never matters") {
    val rnd = new scala.util.Random(13)
    val vs = Seq.fill(3000)(rnd.nextInt(1 << 10).toLong)
    def viaShards(nShards: Int): Seq[(Int, Long, Long)] = {
      val df = vs.zipWithIndex
        .map { case (v, i) => (v, i % nShards) }.toDF("v", "shard")
        .withColumn("g", lit("all"))
      val regs = QuantileDigest.registers(
        df, Seq(col("g"), col("shard")), col("v"), 10, 32)
      QuantileDigest.merge(regs, Seq(col("g")), 10, 32)
        .select("lvl", "cell", "cnt").as[(Int, Long, Long)]
        .collect().toSeq.sorted
    }
    // different shardings compress differently per shard, but the merged
    // digest is a deterministic function of the summed node multiset —
    // equal shardings of equal data always agree; and 1-shard merge ==
    // recompression of the direct digest (idempotent: already < t nodes
    // just re-absorb the same way)
    assert(viaShards(3) === viaShards(3))
    val direct = {
      val df = vs.toDF("v").withColumn("g", lit("all"))
      val regs = QuantileDigest.registers(df, Seq(col("g")), col("v"), 10, 32)
      QuantileDigest.merge(regs, Seq(col("g")), 10, 32)
        .select("lvl", "cell", "cnt").as[(Int, Long, Long)]
        .collect().toSeq.sorted
    }
    val oneShard = viaShards(1)
    assert(oneShard === direct)
  }

  // ---- guards ---------------------------------------------------------------

  test("registers: reserved group-column names fail loud") {
    val df = Seq((1L, "x")).toDF("v", "cell")
    intercept[IllegalArgumentException] {
      QuantileDigest.registers(df, Seq(col("cell")), col("v"), 8, 4)
    }
  }

  test("quantiles: q outside (0,1] fails loud") {
    val df = Seq(1L).toDF("v").withColumn("g", lit("a"))
    val regs = QuantileDigest.registers(df, Seq(col("g")), col("v"), 8, 4)
    intercept[IllegalArgumentException] {
      QuantileDigest.quantiles(regs, Seq(col("g")), Seq(0.0))
    }
  }

  test("quantiles: register-column names (lvl/cell/cnt) as group columns " +
      "fail loud, like registers/merge") {
    val df = Seq(1L, 2L).toDF("v").withColumn("g", lit("a"))
    val regs = QuantileDigest.registers(df, Seq(col("g")), col("v"), 8, 4)
    for (bad <- Seq("lvl", "cell", "cnt")) {
      val e = intercept[IllegalArgumentException] {
        QuantileDigest.quantiles(regs, Seq(col(bad)), Seq(0.5))
      }
      assert(e.getMessage.contains(bad))
    }
  }

  test("compress expression: mis-shaped child fails at analysis, not " +
      "execution") {
    // array<struct> with the wrong field types — analysis-time error with
    // the expression's own message, never an executor ClassCastException
    val df = Seq(Seq((1, 2, 3))).toDF("nodes") // struct<int,int,int>
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.QDigestCompress.expr(col("nodes"), 8, 4))
        .collect()
    }
    assert(e.getMessage.contains("qdigest_compress requires"))
  }
}
