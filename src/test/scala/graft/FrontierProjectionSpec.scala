package graft

import graft.functions.{HyperplaneSig, RandomProjection}
import graft.operators.Frontier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crawl-frontier waves (q212), JL random projection (q215), and the
  * embedding-profile queries (q213/q214) invariants.
  */
class FrontierProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("assignWaves: politeness invariant and deterministic ranking") {
    val urls = Seq(
      ("a.com", 1L, 90L), ("a.com", 2L, 80L), ("a.com", 3L, 70L),
      ("a.com", 4L, 70L), ("a.com", 5L, 60L),
      ("b.com", 6L, 10L)).toDF("domain", "id", "prio")
    val out = Frontier.assignWaves(urls, col("domain"), col("prio"),
      col("id"), perWave = 2)
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("crawl_rank"), r.getAs[Long]("wave"))).toMap
    assert(got(1L) == ((1L, 1L)) && got(2L) == ((2L, 1L)))
    // prio tie at 70 -> smaller id first
    assert(got(3L) == ((3L, 2L)) && got(4L) == ((4L, 2L)))
    assert(got(5L) == ((5L, 3L)))
    assert(got(6L) == ((1L, 1L)))
    val stats = Frontier.waveStats(out, col("domain"))
      .collect().map(r => r.getAs[Long]("wave") -> r.getAs[Long]("max_per_domain"))
    assert(stats.forall(_._2 <= 2))
  }

  test("assignWaves rejects reserved output columns") {
    val urls = Seq(("a.com", 1L, 1L)).toDF("domain", "wave", "prio")
    val e = intercept[IllegalArgumentException] {
      Frontier.assignWaves(urls, col("domain"), col("prio"), col("wave"), 1)
    }
    assert(e.getMessage.contains("wave"))
  }

  test("q212 on the real corpus: no wave exceeds the per-domain budget") {
    val assigned = SparkEntry.queries("q212_frontier_waves")(
      spark, SparkTestSession.Sf0001)
    val bad = Frontier.waveStats(assigned, col("domain"))
      .filter(col("max_per_domain") > 2).count()
    assert(bad == 0)
  }

  test("randomProjection: sign-consistent with HyperplaneSig, null on bad shape") {
    val emb = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
    val rows = emb.select(col("vec_id"),
        RandomProjection.expr(col("embedding"), 64, 8).as("p"),
        HyperplaneSig.expr(col("embedding"), 64, 8).as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getSeq[Long](1)
      val sig = r.getLong(2)
      (0 until 8).foreach { j =>
        assert(((sig >> j) & 1L) == (if (p(j) > 0) 1L else 0L),
          s"vec ${r.getLong(0)} bit $j")
      }
    }
    val bad = Seq((1L, Seq(0.1f, 0.2f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "v")
      .select(RandomProjection.expr(col("v"), 64, 8)).collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("randomProjection: projected distances order planted near vs far pairs") {
    // near pair: tiny perturbation; far pair: independent directions
    def vec(seed: Int, eps: Int): Seq[Float] =
      (0 until 64).map(i => (((seed * 64 + i) * 2654435761L % 1000) / 1000.0f)
        + (if (i == 0) eps / 1000.0f else 0.0f))
    val df = Seq(
      (1L, vec(1, 0)), (2L, vec(1, 5)),   // near
      (3L, vec(7, 0))                     // far from both
    ).toDF("id", "v")
      .select(col("id"), RandomProjection.expr(col("v"), 64, 8).as("p"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def d2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(m(1L), m(2L)) < d2(m(1L), m(3L)))
    assert(d2(m(1L), m(2L)) < d2(m(2L), m(3L)))
  }

  test("q213 energy fractions are monotone and bounded on the real table") {
    val out = SparkEntry.queries("q213_matryoshka_energy")(
      spark, SparkTestSession.Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (f8, f16, f32) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(f8 <= f16 + 1e-9 && f16 <= f32 + 1e-9 && f32 <= 1.0 + 1e-9)
      assert(f8 >= 0.0)
    }
  }

  test("q214 fertility is >= 1000 permille (every word is at least one token)") {
    val out = SparkEntry.queries("q214_tokenizer_fertility")(
      spark, SparkTestSession.Sf0001).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("fertility_permille") >= 1000L,
        r.getAs[String]("lang"))
    }
  }
}
