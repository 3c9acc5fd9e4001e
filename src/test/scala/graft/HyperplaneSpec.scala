package graft

import graft.functions.HyperplaneSig
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperplaneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Plain-Scala reference of the kernel. */
  private def refSig(v: Seq[Float], dim: Int, nBits: Int = 60): Long = {
    val q = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
    var sig = 0L
    for (k <- 0 until nBits) {
      var dot = 0L
      for (i <- 0 until dim)
        dot += q(i) * (((k.toLong * dim + i) * 2654435761L) % 2147483647L % 2001L - 1000L)
      if (dot > 0) sig |= (1L << k)
    }
    sig
  }

  test("HyperplaneSig kernel == scalar reference on the real table") {
    val rows = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        HyperplaneSig.expr(col("embedding"), dim = 64).as("sig"))
      .as[(Long, Seq[Float], Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, sig) =>
      assert(sig == refSig(v, 64), s"vec $id")
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
