package graft

import graft.functions.HyperplaneSig
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperplaneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reimplementation of the coefficient avalanche chain. */
  private def refCoef(n: Long): Long = {
    var a = ((n + 1) * 2654435761L) & 0xFFFFFFFFL
    a ^= a >>> 16
    a = (a * 1540483477L) & 0xFFFFFFFFL
    a ^= a >>> 13
    a % 2001L - 1000L
  }

  /** Plain-Scala reference of the kernel. */
  private def refSig(v: Seq[Float], dim: Int, nBits: Int = 60): Long = {
    val q = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
    var sig = 0L
    for (k <- 0 until nBits) {
      var dot = 0L
      for (i <- 0 until dim)
        dot += q(i) * refCoef(k.toLong * dim + i)
      if (dot > 0) sig |= (1L << k)
    }
    sig
  }

  test("HyperplaneSig kernel == scalar reference on the real table (60 and 63 bits)") {
    val rows = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        HyperplaneSig.expr(col("embedding"), dim = 64).as("sig"),
        HyperplaneSig.expr(col("embedding"), dim = 64, nBits = 63).as("sig63"))
      .as[(Long, Seq[Float], Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, sig, sig63) =>
      assert(sig == refSig(v, 64), s"vec $id")
      assert(sig63 == refSig(v, 64, 63), s"vec $id @63")
      assert(sig63 >= 0, s"sign bit must stay clear: vec $id")
    }
  }

  test("wrong-dimension and null vectors yield null, not a zero-vector bucket") {
    val rows = Seq(
      (1L, Some(Seq.fill(64)(0.5f))),
      (2L, Some(Seq.fill(63)(0.5f))),
      (3L, None)
    ).toDF("id", "embedding")
      .select(HyperplaneSig.expr(col("embedding"), dim = 64).as("sig"))
      .collect().map(r => r.isNullAt(0))
    assert(rows.toSeq == Seq(false, true, true))
  }

  test("LSH property on the real table: same-label pairs are closer in hamming") {
    val sigs = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
      .select(col("vec_id"), col("label"),
        HyperplaneSig.expr(col("embedding"), dim = 64).as("sig"))
    val pairs = sigs.as("a").join(sigs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select((col("a.label") === col("b.label")).as("same"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("double").as("d"))
    val Array(within, across) = pairs.groupBy(col("same")).agg(avg(col("d")))
      .orderBy(col("same").desc).select(col("avg(d)")).as[Double].collect()
    assert(within < across,
      s"within-label hamming $within should be < cross-label $across")
  }

  test("HyperplaneSigWords: word w bit k == scalar reference at hyperplane 62w+k") {
    import graft.functions.HyperplaneSigWords
    def refWord(v: Seq[Float], dim: Int, bitsPerWord: Int, w: Int): Long = {
      val q = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
      var sig = 0L
      for (k <- 0 until bitsPerWord) {
        val h = w * bitsPerWord + k
        var dot = 0L
        for (i <- 0 until dim)
          dot += q(i) * refCoef(h.toLong * dim + i)
        if (dot > 0) sig |= (1L << k)
      }
      sig
    }
    val rows = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
      .select(col("embedding"),
        HyperplaneSigWords.expr(col("embedding"), dim = 64).as("sig"))
      .as[(Seq[Float], Seq[Long])].collect()
    rows.foreach { case (v, sig) =>
      assert(sig.length == 2)
      assert(sig(0) == refWord(v, 64, 62, 0))
      assert(sig(1) == refWord(v, 64, 62, 1))
    }
  }

  test("hammingNearDupPairsWords finds planted near-dups with exact distances") {
    import graft.functions.HyperplaneSigWords
    val base = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // plant: vec_id+10000 = same vector with one coordinate nudged
    val copies = base.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + 0.002f).otherwise(x)).as("embedding"))
    val sigs = base.unionByName(copies).select(col("vec_id"),
      HyperplaneSigWords.expr(col("embedding"), dim = 64).as("sig"))
    val pairs = Dedup.hammingNearDupPairsWords(sigs, col("vec_id"), col("sig"),
      bitsPerWord = 62, words = 2, maxDist = 3, bandsPerWord = 2)
    val planted = pairs
      .filter(col("id_b") === col("id_a") + 10000).count()
    val total = base.count()
    assert(planted >= total * 97 / 100, s"planted recall: $planted / $total")
    assert(pairs.filter(col("dist") > 3).count() == 0)
  }

  test("signatures feed the banded hamming machinery end to end") {
    val sigs = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
      .select(col("vec_id"), HyperplaneSig.expr(col("embedding"), dim = 64).as("sig"))
    val pairs = Dedup.hammingNearDupPairs(sigs, col("vec_id"), col("sig"),
      maxDist = 3, bands = 4)
    // result may legitimately be empty on a clean corpus; the contract is
    // that blocked pairs respect the distance bound
    assert(pairs.filter(col("dist") > 3).count() == 0)
  }
}
