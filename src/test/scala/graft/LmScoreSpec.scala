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

  test("model MLE: conditional probabilities per prefix sum to 1") {
    val model = LmScore.trainTrigramModel(ref, col("text"))
    val sums = model
      .groupBy(substring(col("tri"), 1, 2))
      .agg(sum(col("n_tri").cast("double") / col("n_bi")).as("s"))
      .select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
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
