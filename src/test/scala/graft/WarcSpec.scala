package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def params(n: Int, gz: Int) = {
    (0 until n).map { i =>
      (0L, i.toLong, s"http://example.com/doc/$i", 200 + (i % 2) * 104,
        s"body text $i with UTF-8: 中文 €", gz)
    }.toDF("file_id", "doc_id", "uri", "status", "text", "gzip")
  }

  private def parse(df: org.apache.spark.sql.DataFrame) =
    Warc.parseWarc(Warc.encodeWarc(df)).orderBy("rec_index")

  test("record walk: warcinfo + request/response per doc, in order") {
    val rows = parse(params(3, gz = 0)).collect()
    assert(rows.length == 7) // warcinfo + 3 × (request, response)
    assert(rows.head.getAs[String]("warc_type") == "warcinfo")
    val types = rows.map(_.getAs[String]("warc_type")).toSeq
    assert(types == Seq("warcinfo", "request", "response", "request",
      "response", "request", "response"))
    val resp = rows.filter(_.getAs[String]("warc_type") == "response")
    assert(resp.map(_.getAs[Int]("http_status")).toSeq == Seq(200, 304, 200))
    assert(resp.map(_.getAs[String]("body_text")).toSeq ==
      (0 until 3).map(i => s"body text $i with UTF-8: 中文 €"))
    // n_bytes is the OCTET length of the HTTP payload, not char count
    val b0 = resp.head
    assert(b0.getAs[Long]("n_bytes") ==
      b0.getAs[String]("body_text").getBytes("UTF-8").length.toLong)
  }

  test("per-record gzip members (Common Crawl layout) parse identically to plain") {
    val plain = parse(params(4, gz = 0)).drop("file_id").collect().toSeq
    val gzipped = parse(params(4, gz = 1)).drop("file_id").collect().toSeq
    assert(plain == gzipped)
    // and the gzipped payload really is a multi-member gzip stream
    val payload = Warc.encodeWarc(params(4, gz = 1))
      .select("payload").as[Array[Byte]].head()
    assert((payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B)
    // count member magics — one per record (warcinfo + 4 pairs = 9)
    val members = payload.sliding(2).count(p =>
      (p(0) & 0xFF) == 0x1F && (p(1) & 0xFF) == 0x8B)
    assert(members == 9)
  }

  test("truncated plain shard keeps complete leading records") {
    val payload = Warc.encodeWarc(params(4, gz = 0))
      .select("payload").as[Array[Byte]].head()
    val full = parse(params(4, gz = 0)).count()
    val cut = payload.take(payload.length - payload.length / 3)
    val rows = Warc.parseWarc(Seq((0L, cut)).toDF("file_id", "payload")).collect()
    assert(rows.nonEmpty && rows.length < full)
    assert(rows.head.getAs[String]("warc_type") == "warcinfo")
    // every kept record is complete — bodies intact
    rows.filter(_.getAs[String]("warc_type") == "response").foreach { r =>
      assert(r.getAs[String]("body_text").startsWith("body text"))
    }
  }

  test("truncated gzip shard keeps complete leading members") {
    val payload = Warc.encodeWarc(params(4, gz = 1))
      .select("payload").as[Array[Byte]].head()
    val cut = payload.take(payload.length * 2 / 3)
    val rows = Warc.parseWarc(Seq((0L, cut)).toDF("file_id", "payload")).collect()
    assert(rows.nonEmpty && rows.length < 9)
    assert(rows.head.getAs[String]("warc_type") == "warcinfo")
  }

  test("header names are case-insensitive; garbage yields zero rows") {
    val rec = Warc.record(Seq(
      "warc-type" -> "resource",
      "WARC-TARGET-URI" -> "http://x/y",
      "content-type" -> "text/plain"),
      "hello".getBytes("UTF-8"))
    val rows = Warc.parseWarc(Seq((0L, rec)).toDF("file_id", "payload")).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("warc_type") == "resource")
    assert(rows.head.getAs[String]("target_uri") == "http://x/y")
    assert(rows.head.getAs[String]("body_text") == "hello")
    assert(rows.head.get(rows.head.fieldIndex("http_status")) == null)
    val garbage = Warc.parseWarc(
      Seq((0L, Array.fill[Byte](256)(0x41))).toDF("file_id", "payload"))
    assert(garbage.count() == 0)
  }

  test("a mid-stream malformed record stops the walk, keeping the prefix") {
    val good = Warc.record(Seq("WARC-Type" -> "resource"), "a".getBytes)
    val bad = "NOPE/1.0\r\nContent-Length: 1\r\n\r\nx\r\n\r\n".getBytes
    val tail = Warc.record(Seq("WARC-Type" -> "resource"), "b".getBytes)
    val rows = Warc.parseWarc(
      Seq((0L, good ++ bad ++ tail)).toDF("file_id", "payload")).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("body_text") == "a")
  }

  test("inflate cap rejects a gzip bomb instead of materializing it") {
    // ~100 MB of zeros compresses to ~100 KB; cap at 1 MB
    val bomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      val chunk = new Array[Byte](1 << 20)
      (0 until 100).foreach(_ => gz.write(chunk))
      gz.close(); bos.toByteArray
    }
    val rows = Warc.parseWarc(
      Seq((0L, bomb)).toDF("file_id", "payload"), maxBytes = 1 << 20)
    assert(rows.count() == 0)
  }

  test("chunked transfer-encoding bodies decode; malformed chunking keeps raw") {
    val payload = "hello chunked world!" // 20 bytes
    val chunked = "7;ext=1\r\nhello c\r\nd\r\nhunked world!\r\n0\r\nX-Trailer: v\r\n\r\n"
    def http(body: String) =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" + body).getBytes("UTF-8")
    def rec(body: String) = Warc.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.com/c",
      "Content-Type" -> "application/http; msgtype=response"), http(body))
    val rows = Seq(
      (1L, rec(chunked)),
      // malformed size line: decoder must fall back to the raw payload
      (2L, rec("ZZ\r\nbroken\r\n0\r\n\r\n"))).toDF("file_id", "payload")
    val got = Warc.parseWarc(rows).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(6) == payload)
    assert(got(1L).getLong(5) == payload.length.toLong)
    assert(got(2L).getString(6) == "ZZ\r\nbroken\r\n0\r\n\r\n")
    assert(got(1L).getInt(4) == 200 && got(2L).getInt(4) == 200)
  }

  test("dechunk: exact framing rules (extension, trailer, bad CRLF, short chunk)") {
    def d(s: String) = Warc.dechunk(s.getBytes("UTF-8")).map(new String(_, "UTF-8"))
    assert(d("3\r\nabc\r\n0\r\n\r\n").contains("abc"))
    assert(d("3;name=v\r\nabc\r\n0\r\nTrailer: x\r\n\r\n").contains("abc"))
    assert(d("a\r\n0123456789\r\n0\r\n\r\n").contains("0123456789"))
    assert(d("3\r\nabcXX0\r\n\r\n").isEmpty)   // missing chunk CRLF
    assert(d("5\r\nab\r\n").isEmpty)           // short chunk
    assert(d("q\r\nab\r\n0\r\n\r\n").isEmpty)  // non-hex size
    // hostile near-Int.Max size: must be a clean None (raw fallback), not
    // an Int-overflow crash past the bounds guard
    assert(d("7FFFFFF0\r\nxx\r\n0\r\n\r\n").isEmpty)
  }
}
