package graft

import graft.operators.LmScore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LM quality scoring semantics: in-domain text scores high mean_p / low
  * oov_frac; garbled text the reverse; short docs drop; the decimal-sum
  * score is deterministic across runs.
  */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val ref = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quiet brown bear naps under the old log",
    "a quick brown dog runs over the green field")
    .toDF("text")

  test("in-domain text outranks garbled text; OOV fraction separates them") {
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox naps"),   // in-domain
      (2L, "zxqj wvkk pffr zzzt qqqy"),   // garbled: all-OOV trigrams
      (3L, "ab"))                         // too short: no trigrams
      .toDF("doc_id", "text")
    val got = LmScore.scoreDocs(docs, col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(3L))
    assert(got(1L).getDouble(3) > got(2L).getDouble(3)) // mean_p
    assert(got(1L).getDouble(2) < 0.3)                  // oov_frac
    assert(got(2L).getDouble(2) > 0.9)
    // n_tri = length - 2 trigrams per doc
    assert(got(1L).getLong(1) == "the quick brown fox naps".length - 2)
  }

  test("model MLE: conditional probabilities per prefix hash sum to 1") {
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val sums = model
      .groupBy(col("h2"))
      .agg(sum(col("n_tri").cast("double") / col("n_bi")).as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("compiled trigram-hash kernel == composable string form") {
    val P = 1000000007L
    def fold(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % P)
    val texts = Seq("the quick brown fox", "中文内容测试", "ab", "")
    val got = texts.toDF("text")
      .select(LmScore.trigramHashes(col("text"))).as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, packed) =>
      val tris = if (t.length < 3) Seq.empty
        else (0 to t.length - 3).map(i => t.substring(i, i + 3))
      assert(packed.length == tris.length, t)
      tris.zip(packed).foreach { case (tri, p) =>
        assert((p >>> 31) == fold(tri), s"h3 of '$tri'")
        assert((p & ((1L << 31) - 1)) == fold(tri.take(2)), s"h2 of '$tri'")
      }
    }
  }

  test("Log2Fixed kernel: |log2fp(m)/2^20 − log2(m)| ≲ 3e-6, scalar == Column") {
    import graft.functions.Log2Fixed
    val samples = Seq(1L, 2L, 3L, 5L, 7L, 1023L, 1024L, 1025L, 65537L,
      1048575L, 1048576L, 1048577L, 999999937L, (1L << 42) + 12345L)
    samples.foreach { m =>
      val got = Log2Fixed(m).toDouble / Log2Fixed.One
      val exact = StrictMath.log(m.toDouble) / StrictMath.log(2.0)
      assert(math.abs(got - exact) < 3e-6, s"m=$m got=$got exact=$exact")
    }
    // the Column expression computes the identical integers
    val viaSpark = samples.toDF("m")
      .select(col("m"), Log2Fixed.expr(col("m")).as("lg"))
      .as[(Long, Long)].collect().toMap
    samples.foreach(m => assert(viaSpark(m) == Log2Fixed(m), s"m=$m"))
  }

  test("log2 scoring ranks like exact mean log p (perplexity order)") {
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val docs = Seq(
      (1L, "the quick brown fox naps"),       // strongly in-domain
      (2L, "the quiet green bear jumps ok"),  // mixed
      (3L, "a dog naps under the green log"), // in-domain, other phrasing
      (4L, "qu bro the ver own zzz"))         // fragments + one OOV burst
      .toDF("doc_id", "text")
    val got = LmScore.scoreDocsLog2(docs, col("doc_id"), col("text"), model)
      .collect().map(r => (r.getLong(0), (r.getDouble(3), r.getDouble(2)))).toMap
    // exact mean log2 p over in-vocab trigrams, straight doubles
    val modelRows = model.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val P = 1000000007L
    def fold(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % P)
    def exactMean(t: String): Double = {
      val ps = (0 to t.length - 3).map(i => t.substring(i, i + 3))
        .flatMap(tri => modelRows.get(fold(tri)))
        .map { case (nt, nb) =>
          StrictMath.log(nt.toDouble / nb) / StrictMath.log(2.0) }
      ps.sum / ps.length
    }
    val texts = Map(1L -> "the quick brown fox naps",
      2L -> "the quiet green bear jumps ok",
      3L -> "a dog naps under the green log",
      4L -> "qu bro the ver own zzz")
    val byFixed = got.toSeq.sortBy(_._2._1).map(_._1)
    val byExact = texts.keys.toSeq.sortBy(id => exactMean(texts(id)))
    assert(byFixed == byExact, s"fixed=$byFixed exact=$byExact")
    // fixed-point means track the exact values closely
    texts.foreach { case (id, t) =>
      assert(math.abs(got(id)._1 - exactMean(t)) < 1e-4, s"doc $id")
    }
    // all-OOV doc → null mean, oov_frac 1.0
    val oov = LmScore.scoreDocsLog2(
        Seq((9L, "zxqj wvkk pffr")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), model).head()
    assert(oov.isNullAt(3) && oov.getDouble(2) == 1.0)
  }

  test("scores are bit-identical across runs (decimal-summed)") {
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val docs = Seq((1L, "the quick brown fox jumps high over dogs"))
      .toDF("doc_id", "text")
    def run() = LmScore.scoreDocs(docs, col("doc_id"), col("text"), model)
      .select("mean_p").as[Double].head()
    assert(run() == run())
  }
}
