package graft

import graft.operators.{AnchorText, DomainCuration}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Anchor-text aggregation (q209) and domain-level curation (q210). */
class AnchorDomainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("anchorPairs: attribute tolerance, trim, plain-text-anchor contract") {
    val html = Seq(
      """<p>x</p><a href="/a">Home</a><a class="c" href="/b" id="z">  padded  </a>""" +
        """<a>no href</a><a href="/c"><span>nested</span></a><a href="/d"></a>"""
    ).toDF("h")
    val got = html.select(AnchorText.anchorPairs(col("h")))
      .as[Seq[(String, String)]].collect().head
    // no-href anchors never match; anchors whose text contains markup are
    // skipped by contract ([^<]* — plain-text anchors only); empty text ok
    assert(got == Seq(("/a", "Home"), ("/b", "padded"), ("/d", "")))
  }

  test("anchorPairs: data-href cannot capture; '>' inside the href value stays in the href") {
    val html = Seq(
      """<a data-href="/wrong" href="/right">text</a>""" +
        """<a href="/p?a>b">label</a>""").toDF("h")
    val got = html.select(AnchorText.anchorPairs(col("h")))
      .as[Seq[(String, String)]].collect().head
    assert(got == Seq(("/right", "text"), ("/p?a>b", "label")))
  }

  test("aggregateAnchors: modal text with lexicographic tie-break, sorted concat") {
    val pairs = Seq(
      ("/t", "beta"), ("/t", "alpha"), ("/t", "beta"), ("/t", "alpha"),
      ("/t", "zeta"),
      ("/u", "only")).toDF("dst", "anchor")
    val got = AnchorText.aggregateAnchors(pairs, col("dst"), col("anchor"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getString(5)))
      .toMap
    // alpha and beta tie at 2 — lexicographically smaller wins
    assert(got("/t") == ((5L, 3L, "alpha", 2L, "alpha|beta|zeta")))
    assert(got("/u") == ((1L, 1L, "only", 1L, "only")))
  }

  test("domainStats: floor permille") {
    val docs = Seq(("a.com", 1), ("a.com", 0), ("a.com", 0),
      ("b.com", 1)).toDF("domain", "keep")
    val got = DomainCuration.domainStats(docs, col("domain"), col("keep"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("a.com") == ((3L, 1L, 333L)))
    assert(got("b.com") == ((1L, 1L, 1000L)))
  }

  test("curate: permille gate and minDocs gate are independent; kept = doc AND domain") {
    val docs = Seq(
      ("a.com", 1L, 1), ("a.com", 2L, 1), ("a.com", 3L, 0), // 666 permille
      ("b.com", 4L, 1), ("b.com", 5L, 0), ("b.com", 6L, 0), // 333 permille
      ("c.com", 7L, 1)                                      // 1000 but 1 doc
    ).toDF("domain", "id", "keep")
    val got = DomainCuration.curate(docs, col("domain"), col("keep"),
        minDocs = 2, minKeepPermille = 500)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("domain_ok"), r.getAs[Int]("kept"))).toMap
    assert(got(1L) == ((1, 1)) && got(2L) == ((1, 1)) && got(3L) == ((1, 0)))
    assert(got(4L) == ((0, 0)) && got(5L) == ((0, 0)) && got(6L) == ((0, 0)))
    assert(got(7L) == ((0, 0))) // fails minDocs despite permille 1000
  }

  test("curate: null domains get an audited verdict instead of vanishing") {
    val docs = Seq(
      ("a.com", 1L, 1), ("a.com", 2L, 1),
      (null.asInstanceOf[String], 3L, 1), (null.asInstanceOf[String], 4L, 0)
    ).toDF("domain", "id", "keep")
    val out = DomainCuration.curate(docs, col("domain"), col("keep"),
      minDocs = 2, minKeepPermille = 500)
    assert(out.count() == 4) // nothing dropped
    val got = out.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("domain_docs"), r.getAs[Long]("domain_keep_permille"),
        r.getAs[Int]("kept"))).toMap
    // the null group: 2 docs, 500 permille -> passes both gates
    assert(got(3L) == ((2L, 500L, 1)))
    assert(got(4L) == ((2L, 500L, 0)))
  }

  test("curate rejects reserved output column names") {
    val docs = Seq(("a.com", 1, 1)).toDF("domain", "kept", "keep")
    val e = intercept[IllegalArgumentException] {
      DomainCuration.curate(docs, col("domain"), col("keep"), 1, 0)
    }
    assert(e.getMessage.contains("kept"))
  }
}
