package graft

import graft.operators.Contamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-form decontamination (q211): value-identity with the broadcast
  * form, Bloom-prefilter invisibility, and the zero-gram/null-text
  * survival contract.
  */
class ContaminationJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = {
    val d = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
    (d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"))
  }

  test("join form == broadcast form on the real corpus (hashed grams collision-free)") {
    val (docs, bench) = corpus
    val broad = Contamination.overlapStats(
      docs, col("doc_id"), col("text"), bench, col("text"), k = 3)
    val joined = Contamination.overlapStatsJoin(
      docs, col("doc_id"), col("text"), bench, col("text"), k = 3)
    assert(joined.schema.map(f => (f.name, f.dataType)) ==
      broad.schema.map(f => (f.name, f.dataType)))
    val a = broad.orderBy("doc_id").collect().map(_.toSeq)
    val b = joined.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length && a.length > 0)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("Bloom prefilter is output-invisible (on == off)") {
    val (docs, bench) = corpus
    val off = Contamination.overlapStatsJoin(
      docs, col("doc_id"), col("text"), bench, col("text"), k = 3)
    val on = Contamination.overlapStatsJoin(
      docs, col("doc_id"), col("text"), bench, col("text"), k = 3,
      bloomPrefilter = true, bloomFpp = 0.2) // high fpp: false positives must die in the exact join
    val a = off.orderBy("doc_id").collect().map(_.toSeq)
    val b = on.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("short and null texts survive as n_sh=0, contam_frac=0.0") {
    val docs = Seq((1L, "one two"), (2L, null.asInstanceOf[String]),
      (3L, "alpha beta gamma alpha beta gamma")).toDF("id", "text")
    val bench = Seq("alpha beta gamma").toDF("text")
    val out = Contamination.overlapStatsJoin(
        docs, col("id"), col("text"), bench, col("text"), k = 3,
        bloomPrefilter = true)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((0L, 0L, 0.0)))
    assert(out(2L) == ((0L, 0L, 0.0)))
    // grams: [alpha beta gamma],[beta gamma alpha],[gamma alpha beta],
    // then a repeat — 3 DISTINCT, 1 in the bench set
    assert(out(3L) == ((3L, 1L, 0.333333)))
  }
}
