package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compressed-payload text ingestion: real corpora arrive as .gz / .zst /
  * deflate / .bz2 blobs (per-document or per-record), and a 100 TB reader
  * must decode them ON EXECUTORS, codec-sniffed from magic bytes — never
  * trusted from a path suffix. Decoders are the JVM's own
  * (java.util.zip) plus the codecs Spark already ships (zstd-jni,
  * commons-compress); nothing new is bundled.
  *
  * The whole-FILE compressed case (a .jsonl.gz corpus shard) is already
  * handled by Spark's text/json readers; this operator covers the
  * per-ROW payload case — compressed blobs inside a table column, the
  * shape scraped archives and KB dumps actually take (reference analog:
  * the binary-payload sniffing chain, 多数据源获取数据.py:1384-1447).
  */
object Compressed {

  /** Codec names recognized by [[sniffCodec]]. */
  val Gzip = "gzip"
  val Zstd = "zstd"
  val Bzip2 = "bzip2"
  val Zlib = "zlib"

  /** Identify the compression codec from magic bytes, null when unknown. */
  def sniffCodec(b: Array[Byte]): String = {
    if (b == null || b.length < 4) null
    else if ((b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B) Gzip
    else if ((b(0) & 0xFF) == 0x28 && (b(1) & 0xFF) == 0xB5 &&
      (b(2) & 0xFF) == 0x2F && (b(3) & 0xFF) == 0xFD) Zstd
    else if (b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9') Bzip2
    // zlib: 0x78 CMF + a valid FCHECK byte (the common levels)
    else if ((b(0) & 0xFF) == 0x78 &&
      (((b(0) & 0xFF) << 8 | (b(1) & 0xFF)) % 31 == 0)) Zlib
    else null
  }

  private def inflate(codec: String, b: Array[Byte]): Array[Byte] = {
    val in = new java.io.ByteArrayInputStream(b)
    val stream: java.io.InputStream = codec match {
      case Gzip => new java.util.zip.GZIPInputStream(in)
      case Zlib => new java.util.zip.InflaterInputStream(in)
      case Zstd => new com.github.luben.zstd.ZstdInputStream(in)
      case Bzip2 =>
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(in)
      case _ => throw new IllegalArgumentException(s"unknown codec $codec")
    }
    try stream.readAllBytes() finally stream.close()
  }

  /** Decode (media_id, payload) rows to text: sniff the codec from magic
    * bytes, inflate on the executor, decode UTF-8. Unknown or corrupt
    * payloads keep their row with null text and a null/sniffed codec (the
    * caller's filter decides) — a damaged blob never fails the job.
    * `maxBytes` caps the inflated size per row (zip-bomb guard: a hostile
    * 1 KB payload can inflate to GBs and OOM an executor — rows over the
    * cap are treated as corrupt).
    *
    * Output: (media_id, codec, text, n_chars).
    */
  def decompressText(media: DataFrame, maxBytes: Int = 64 << 20): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("codec", StringType, nullable = true),
      StructField("text", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val codec = sniffCodec(b)
          if (codec == null) Row(id, null, null, null)
          else {
            try {
              // bounded inflate: read up to maxBytes + 1 and reject over-cap
              val in = new java.io.ByteArrayInputStream(b)
              val stream: java.io.InputStream = codec match {
                case Gzip => new java.util.zip.GZIPInputStream(in)
                case Zlib => new java.util.zip.InflaterInputStream(in)
                case Zstd => new com.github.luben.zstd.ZstdInputStream(in)
                case Bzip2 => new org.apache.commons.compress.compressors
                  .bzip2.BZip2CompressorInputStream(in)
              }
              val out = try stream.readNBytes(maxBytes + 1) finally stream.close()
              if (out.length > maxBytes) Row(id, codec, null, null)
              else {
                val text = new String(out, java.nio.charset.StandardCharsets.UTF_8)
                Row(id, codec, text, text.length.toLong)
              }
            } catch {
              case _: Exception => Row(id, codec, null, null)
            }
          }
        }
      }(encoder)
  }

  /** Fixture/round-trip encoder: compress (id, text[, codec]) rows on
    * executors — codec 0=gzip 1=zstd 2=zlib 3=bzip2 (default gzip).
    */
  def compressText(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val codecCol = if (df.columns.contains("codec")) col("codec").cast("int") else lit(0)
    df.select(col("id").cast("long"), col("text"), codecCol)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val bos = new java.io.ByteArrayOutputStream()
          val stream: java.io.OutputStream = r.getInt(2) match {
            case 1 => new com.github.luben.zstd.ZstdOutputStream(bos)
            case 2 => new java.util.zip.DeflaterOutputStream(bos)
            case 3 => new org.apache.commons.compress.compressors
              .bzip2.BZip2CompressorOutputStream(bos)
            case _ => new java.util.zip.GZIPOutputStream(bos)
          }
          stream.write(bytes); stream.close()
          Row(r.getLong(0), bos.toByteArray)
        }
      }(encoder)
  }
}
