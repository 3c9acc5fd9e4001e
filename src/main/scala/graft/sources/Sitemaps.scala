package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sitemap (sitemaps.org XML) ingestion — the crawl-frontier seed format:
  * a scraping pipeline at corpus scale discovers URLs from sitemap shards
  * (often .xml.gz, fanned out behind a <sitemapindex>), not from manual
  * link lists (the reference seeds from hand-entered query fan-outs,
  * LINKS:561-640; sitemaps are the web-scale analog).
  *
  * Parsing is REAL XML — the JDK's own StAX pull parser, namespace-aware,
  * coalescing (CDATA-safe) — not regex; and it is hardened the way a
  * parser fed hostile web content must be: DTDs and external entities are
  * DISABLED (XXE guard — a sitemap must never make an executor read
  * /etc/passwd or call home), and a malformed document keeps the complete
  * entries before the error (damaged-tail posture of the WARC/TAR walks).
  * One task per shard, zero shuffle.
  */
object Sitemaps {

  /** Fixture/sink encoder: (file_id, doc_id, loc, lastmod, changefreq,
    * priority, kind, gzip) rows → (file_id, payload) sitemap XML shards
    * (kind "url" → &lt;urlset&gt;, "sitemap" → &lt;sitemapindex&gt;;
    * gzip=1 → whole-file gzip, the .xml.gz shape).
    */
  def encodeSitemaps(params: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("file_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    params
      .select(col("file_id").cast("long"), col("doc_id").cast("long"),
        col("loc"), col("lastmod"), col("changefreq"),
        col("priority").cast("double"), col("kind"), col("gzip").cast("int"))
      .groupBy(col("file_id"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("loc"),
        col("lastmod"), col("changefreq"), col("priority"), col("kind"))))
        .as("es"), max(col("gzip")).as("gz"))
      .mapPartitions { rows =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        rows.map { r =>
          val es = r.getSeq[Row](1)
          val isIndex = es.nonEmpty && es.head.getString(5) == "sitemap"
          val root = if (isIndex) "sitemapindex" else "urlset"
          val entry = if (isIndex) "sitemap" else "url"
          val sb = new StringBuilder(
            "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
          sb.append(s"<$root xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
          es.foreach { e =>
            sb.append(s"  <$entry><loc>").append(e.getString(1)).append("</loc>")
            if (e.getString(2) != null)
              sb.append("<lastmod>").append(e.getString(2)).append("</lastmod>")
            if (!isIndex) {
              if (e.getString(3) != null)
                sb.append("<changefreq>").append(e.getString(3)).append("</changefreq>")
              if (!e.isNullAt(4))
                sb.append("<priority>").append(e.getDouble(4)).append("</priority>")
            }
            sb.append(s"</$entry>\n")
          }
          sb.append(s"</$root>\n")
          val xml = sb.toString.getBytes(utf8)
          val bytes =
            if (r.getInt(2) == 1) {
              val bos = new java.io.ByteArrayOutputStream()
              val gz = new java.util.zip.GZIPOutputStream(bos)
              gz.write(xml); gz.close()
              bos.toByteArray
            } else xml
          Row(r.getLong(0), bytes)
        }
      }(encoder)
  }

  /** Parse (file_id, payload) sitemap shards (gzip-sniffed) into one row
    * per entry: (file_id, entry_idx, kind, loc, lastmod, changefreq,
    * priority). Entries missing &lt;loc&gt; are dropped (the spec makes
    * loc mandatory); unknown child elements are skipped, not errors.
    */
  def parseSitemaps(files: DataFrame, maxBytes: Int = 64 << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("file_id", LongType, nullable = false),
      StructField("entry_idx", IntegerType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("loc", StringType, nullable = false),
      StructField("lastmod", StringType, nullable = true),
      StructField("changefreq", StringType, nullable = true),
      StructField("priority", DoubleType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    files.select(col("file_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val fileId = r.getLong(0)
          val raw = r.getAs[Array[Byte]](1)
          val bytes =
            if (Compressed.sniffCodec(raw) == Compressed.Gzip) {
              val acc = new java.io.ByteArrayOutputStream()
              try {
                val in = new java.util.zip.GZIPInputStream(
                  new java.io.ByteArrayInputStream(raw))
                try {
                  val chunk = new Array[Byte](64 << 10)
                  var n = in.read(chunk)
                  while (n >= 0 && acc.size <= maxBytes) {
                    acc.write(chunk, 0, n); n = in.read(chunk)
                  }
                } finally in.close()
              } catch { case _: Exception => () }
              if (acc.size > maxBytes) Array.empty[Byte] else acc.toByteArray
            } else raw
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          if (bytes.nonEmpty) {
            val f = javax.xml.stream.XMLInputFactory.newFactory()
            f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
            // XXE hardening: no DTDs, no external entities — hostile web
            // XML must never reach the filesystem or network from a task
            f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
            f.setProperty(
              javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
            try {
              val xr = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
              var idx = 0
              var kind: String = null
              var loc: String = null
              var lastmod: String = null
              var changefreq: String = null
              var priority: java.lang.Double = null
              var field: String = null
              val sb = new StringBuilder
              while (xr.hasNext) {
                xr.next() match {
                  case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
                    xr.getLocalName match {
                      case "url" | "sitemap" =>
                        kind = xr.getLocalName
                        loc = null; lastmod = null; changefreq = null; priority = null
                      case n @ ("loc" | "lastmod" | "changefreq" | "priority")
                        if kind != null =>
                        field = n; sb.clear()
                      case _ => field = null
                    }
                  case javax.xml.stream.XMLStreamConstants.CHARACTERS
                    | javax.xml.stream.XMLStreamConstants.CDATA =>
                    if (field != null) sb.append(xr.getText)
                  case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
                    xr.getLocalName match {
                      case "loc" if field == "loc" => loc = sb.toString.trim
                      case "lastmod" if field == "lastmod" => lastmod = sb.toString.trim
                      case "changefreq" if field == "changefreq" =>
                        changefreq = sb.toString.trim
                      case "priority" if field == "priority" =>
                        priority = sb.toString.trim.toDoubleOption
                          .map(java.lang.Double.valueOf).orNull
                      case "url" | "sitemap" =>
                        if (kind != null && loc != null && loc.nonEmpty) {
                          out += Row(fileId, idx, kind, loc, lastmod,
                            changefreq, priority)
                          idx += 1
                        }
                        kind = null
                      case _ => ()
                    }
                    field = null
                  case _ => ()
                }
              }
              xr.close()
            } catch { case _: Exception => () } // malformed tail: keep prefix
          }
          out
        }
      }(encoder)
  }
}
