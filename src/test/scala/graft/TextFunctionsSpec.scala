package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's cleaning assertions (_test_parser.py:51-59:
  * noise lines removed, real content kept) plus the text-analysis metrics.
  */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head().get(0)

  test("tokens and counts") {
    assert(one(tokenCount(lit("the fast  key "))) == 3)
    assert(one(tokenCount(lit(""))) == 0)
    assert(one(tokenCount(lit("   "))) == 0)
  }

  test("shingles are ordered k-grams") {
    assert(one(shingles(lit("a b c d"), 3)) == Seq("a b c", "b c d"))
    assert(one(shingles(lit("a b"), 3)) == Seq())
  }

  test("quality buckets gate on length, diversity, stopwords") {
    assert(one(qualityBucket(lit("short doc"))) == "too_short")
    val repetitive = ("word " * 50).trim
    assert(one(qualityBucket(lit(repetitive))) == "repetitive")
    val boiler = (("the a of to and in is it on an " * 3) + "unique1 unique2 extra4 more5 word6 seven8").trim
    assert(one(qualityBucket(lit(boiler))) == "boilerplate")
    val ok = (1 to 30).map(i => s"tok$i").mkString(" ")
    assert(one(qualityBucket(lit(ok))) == "ok")
  }

  test("language-ID heuristic picks marker-word majority") {
    assert(one(langIdHeuristic(lit("the cat and the dog of the house is big"))) == "en")
    assert(one(langIdHeuristic(lit("der hund und die katze ist hier"))) == "de")
    assert(one(langIdHeuristic(lit("xyz abc qqq"))) == "und")
  }

  test("compiled lang-ID vote == composable form on real documents (incl. ties)") {
    val docs = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
      .select(col("text"))
      // synthetic tie rows: equal marker hits across languages must resolve
      // to the lexicographically greatest language in both forms
      .unionByName(Seq("the der", "le el 的", "is est es y", "").toDF("text"))
    val diff = docs.select(
        langIdHeuristic(col("text")).as("compiled"),
        langIdHeuristicComposable(col("text")).as("composable"))
      .filter(not(col("compiled") <=> col("composable")))
      .count()
    assert(diff == 0)
  }

  test("cleanDocument drops noise/page-number/link-dense lines, keeps content") {
    val doc = Seq(
      "真实的正文内容保留在这里",
      "- 3 -",
      "第 12 页",
      "Page 3 of 10",
      "Copyright 2024 Example Corp",
      "点击查看更多内容",
      "http://a.cn/1 http://a.cn/2 http://a.cn/3",
      "结尾内容（责任编辑：李四）也保留").mkString("\n")
    val cleaned = one(cleanDocument(lit(doc))).toString
    assert(cleaned.contains("真实的正文内容保留在这里"))
    assert(cleaned.contains("结尾内容"))
    assert(cleaned.contains("也保留"))
    assert(!cleaned.contains("责任编辑"))
    assert(!cleaned.contains("- 3 -"))
    assert(!cleaned.contains("第 12 页"))
    assert(!cleaned.contains("Page 3"))
    assert(!cleaned.contains("Copyright"))
    assert(!cleaned.contains("点击查看"))
    assert(!cleaned.contains("http://a.cn/2"))
  }

  test("truncateWithMarker caps content (O7)") {
    assert(one(truncateWithMarker(lit("x" * 100), 10)).toString == "x" * 10 + "…[truncated]")
    assert(one(truncateWithMarker(lit("short"), 10)).toString == "short")
  }

  test("fingerprint is deterministic and content-sensitive") {
    val a = one(fingerprint(lit("the quick brown fox")))
    val b = one(fingerprint(lit("the quick brown fox")))
    val c = one(fingerprint(lit("the quick brown cat")))
    assert(a == b)
    assert(a != c)
  }

  test("urlHost: lowercases, strips scheme/port/userinfo/path") {
    assert(one(urlHost(lit("HTTPS://WWW.Example.COM/a/b?q=1"))).toString == "www.example.com")
    assert(one(urlHost(lit("http://example.com:8080/x"))).toString == "example.com")
    assert(one(urlHost(lit("https://user:pw@site.org/p"))).toString == "site.org")
  }

  test("htmlMainContent: boilerplate containers and link-dense blocks drop, prose survives") {
    val html =
      """<html><body><nav><a href="/">Home</a> <a href="/b">Blog</a></nav>""" +
        """<header><h1>Site Banner</h1></header>""" +
        """<div><a href="/1">One</a> <a href="/2">Two</a> ad</div>""" +
        """<p>Real prose with a single <a href="/ref">reference link</a> inside a long sentence.</p>""" +
        """<aside>related stuff</aside>""" +
        """<footer>(c) nobody</footer></body></html>"""
    val got = one(htmlMainContent(lit(html))).toString
    // prose with a MINORITY link survives; everything else dies
    assert(got == "Real prose with a single reference link inside a long sentence.", got)
  }

  test("htmlMainContent: all-boilerplate page extracts to empty") {
    val html = """<body><nav><a>x</a></nav><div><a href="/">only links</a></div></body>"""
    assert(one(htmlMainContent(lit(html))).toString == "")
  }

  test("registrableDomain: eTLD+1 with two-label ccTLD suffixes") {
    def rd(h: String) = one(registrableDomain(lit(h))).toString
    assert(rd("www.example.com") == "example.com")
    assert(rd("a.b.c.example.com") == "example.com")
    assert(rd("news.bbc.co.uk") == "bbc.co.uk")       // two-label suffix → 3 labels
    assert(rd("media3.com.cn") == "media3.com.cn")    // host IS eTLD+1 already
    assert(rd("x.media3.com.cn") == "media3.com.cn")
    assert(rd("plain.net") == "plain.net")            // 2 labels → itself
    assert(rd("localhost") == "localhost")
    // unknown TLD falls back to last two labels (mini-PSL caveat)
    assert(rd("deep.sub.example.dev") == "example.dev")
  }
}
