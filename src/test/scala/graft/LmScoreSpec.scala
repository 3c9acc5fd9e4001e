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

  test("scores are bit-identical across runs (decimal-summed)") {
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val docs = Seq((1L, "the quick brown fox jumps high over dogs"))
      .toDF("doc_id", "text")
    def run() = LmScore.scoreDocs(docs, col("doc_id"), col("text"), model)
      .select("mean_p").as[Double].head()
    assert(run() == run())
  }
}
