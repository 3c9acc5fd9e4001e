package graft

import graft.sources.Sitemaps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SitemapsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parse(xml: String) =
    Sitemaps.parseSitemaps(
      Seq((0L, xml.getBytes("UTF-8"))).toDF("file_id", "payload"))

  test("urlset round-trip, gzip parity") {
    def p(gz: Int) = (0 until 3).map { i =>
      (0L, i.toLong, s"https://ex.com/p/$i", s"2026-01-0${i + 1}",
        "daily", 0.5, "url", gz)
    }.toDF("file_id", "doc_id", "loc", "lastmod", "changefreq",
      "priority", "kind", "gzip")
    val plain = Sitemaps.parseSitemaps(Sitemaps.encodeSitemaps(p(0)))
      .orderBy("entry_idx").drop("file_id").collect().toSeq
    val gzipped = Sitemaps.parseSitemaps(Sitemaps.encodeSitemaps(p(1)))
      .orderBy("entry_idx").drop("file_id").collect().toSeq
    assert(plain == gzipped)
    assert(plain.length == 3)
    assert(plain.head.getAs[String]("loc") == "https://ex.com/p/0")
    assert(plain.head.getAs[Double]("priority") == 0.5)
  }

  test("sitemapindex entries carry kind=sitemap") {
    val p = Seq((0L, 1L, "https://ex.com/sitemap-1.xml.gz",
      "2026-02-01", null: String, null: java.lang.Double, "sitemap", 0))
      .toDF("file_id", "doc_id", "loc", "lastmod", "changefreq", "priority",
        "kind", "gzip")
    val rows = Sitemaps.parseSitemaps(Sitemaps.encodeSitemaps(p)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("kind") == "sitemap")
    assert(rows.head.getAs[String]("loc") == "https://ex.com/sitemap-1.xml.gz")
  }

  test("CDATA loc and entity escapes decode through real XML parsing") {
    val xml = """<?xml version="1.0"?>
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url><loc><![CDATA[https://ex.com/a?x=1&y=2]]></loc></url>
        <url><loc>https://ex.com/b?x=1&amp;y=2</loc></url>
      </urlset>"""
    val rows = parse(xml).orderBy("entry_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("loc") == "https://ex.com/a?x=1&y=2")
    assert(rows(1).getAs[String]("loc") == "https://ex.com/b?x=1&y=2")
  }

  test("XXE guard: DOCTYPE/external entities never expand or crash the task") {
    val evil = """<?xml version="1.0"?>
      <!DOCTYPE urlset [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
      <urlset><url><loc>&xxe;</loc></url></urlset>"""
    val rows = parse(evil).collect()
    // DTD support is off: the document is rejected at the DOCTYPE — no
    // file read, no exception escaping the task, zero entries emitted
    assert(rows.isEmpty)
  }

  test("malformed tail keeps complete leading entries") {
    val xml = """<?xml version="1.0"?>
      <urlset><url><loc>https://ex.com/1</loc></url>
      <url><loc>https://ex.com/2</loc></url>
      <url><loc>https://ex.com/3"""
    val rows = parse(xml).orderBy("entry_idx").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("loc")).toSeq ==
      Seq("https://ex.com/1", "https://ex.com/2"))
  }

  test("entries without loc are dropped; unknown children are skipped") {
    val xml = """<?xml version="1.0"?>
      <urlset>
        <url><lastmod>2026-01-01</lastmod></url>
        <url><loc>https://ex.com/ok</loc><mobile>yes</mobile></url>
      </urlset>"""
    val rows = parse(xml).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("loc") == "https://ex.com/ok")
  }
}
