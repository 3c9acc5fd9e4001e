package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FLAC and Ogg/Vorbis container-metadata decode — the lossless and
  * free-codec thirds of the scraped-audio landscape (MP3/AAC frame walks
  * live in [[Multimodal]]). Same posture as q99/q101/q104: the container
  * layer is REAL pure-JVM arithmetic over the public specs (the FLAC
  * format spec / RFC 3533 + Vorbis I); only spectral decode stays behind
  * the seam (no codec in the JDK). Reference analog: the format-sniffing
  * chain (多数据源获取数据.py:1384-1447).
  */
object AudioContainers {

  // ---- FLAC ---------------------------------------------------------------

  /** Encode (id, sample_rate, channels, bits, total_samples[, pad_len])
    * rows as REAL FLAC byte streams: "fLaC" magic, a STREAMINFO metadata
    * block with the packed 20/3/5/36-bit field, an optional PADDING block,
    * and deterministic filler "frames". The fixture generator for q107 and
    * specs; runs on executors like the other encoders.
    */
  def encodeFlacs(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val padCol = if (df.columns.contains("pad_len")) col("pad_len").cast("int") else lit(0)
    df.select(col("id").cast("long"), col("sample_rate").cast("int"),
        col("channels").cast("int"), col("bits").cast("int"),
        col("total_samples").cast("long"), padCol)
      .mapPartitions { rows =>
        rows.map { r =>
          val sr = r.getInt(1); val ch = r.getInt(2)
          val bits = r.getInt(3); val total = r.getLong(4)
          val pad = r.getInt(5)
          val out = new java.io.ByteArrayOutputStream()
          out.write("fLaC".getBytes("US-ASCII"))
          // STREAMINFO: last-block flag only when no padding follows
          out.write(if (pad > 0) 0x00 else 0x80)
          out.write(0); out.write(0); out.write(34)
          val b = java.nio.ByteBuffer.allocate(34)
          b.putShort(4096)                  // min block size
          b.putShort(4096)                  // max block size
          b.put(new Array[Byte](6))         // min/max frame size (unknown)
          // packed: sr(20) | ch-1(3) | bits-1(5) | total(36)
          val packed = (sr.toLong << 44) | ((ch - 1).toLong << 41) |
            ((bits - 1).toLong << 36) | (total & 0xFFFFFFFFFL)
          b.putLong(packed)
          b.put(new Array[Byte](16))        // MD5 (unset)
          out.write(b.array())
          if (pad > 0) {
            out.write(0x81)                 // last block, type 1 = PADDING
            out.write((pad >> 16) & 0xFF); out.write((pad >> 8) & 0xFF)
            out.write(pad & 0xFF)
            var i = 0
            while (i < pad) { out.write(0); i += 1 }
          }
          // deterministic filler "audio frames" (never parsed)
          var i = 0
          while (i < 64) { out.write((i * 41 + 3) & 0xFF); i += 1 }
          Row(r.getLong(0), out.toByteArray)
        }
      }(encoder)
  }

  /** REAL FLAC METADATA decode: validate the "fLaC" magic, walk the
    * metadata-block chain by its 1+3-byte headers to STREAMINFO (type 0),
    * and unpack the 20-bit sample rate / 3-bit channels / 5-bit bit-depth
    * / 36-bit total-sample fields. duration_ms is exact integer math.
    * Non-FLAC / truncated payloads keep their row with null fields.
    *
    * Output: (media_id, sample_rate, channels, bits_per_sample,
    * total_samples, duration_ms).
    */
  def decodeFlacMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits_per_sample", IntegerType, nullable = true),
      StructField("total_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          def nulls = Row(id, null, null, null, null, null)
          if (b.length < 8 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') nulls
          else {
            var pos = 4
            var found: Row = null
            var last = false
            while (found == null && !last && pos + 4 <= b.length) {
              val hdr = b(pos) & 0xFF
              last = (hdr & 0x80) != 0
              val typ = hdr & 0x7F
              val len = ((b(pos + 1) & 0xFF) << 16) | ((b(pos + 2) & 0xFF) << 8) |
                (b(pos + 3) & 0xFF)
              val body = pos + 4
              if (typ == 0 && len >= 34 && body + 34 <= b.length) {
                val packed = java.nio.ByteBuffer.wrap(b, body + 10, 8).getLong
                val sr = (packed >>> 44).toInt
                val ch = ((packed >>> 41) & 0x7).toInt + 1
                val bits = ((packed >>> 36) & 0x1F).toInt + 1
                val total = packed & 0xFFFFFFFFFL
                if (sr <= 0) found = nulls
                else found = Row(id, sr, ch, bits, total,
                  if (total > 0) Long.box(total * 1000L / sr) else null)
              }
              pos = body + len
            }
            if (found == null) nulls else found
          }
        }
      }(encoder)
  }

  // ---- ID3v2 text frames --------------------------------------------------

  /** Encode (id, title, artist, album, v, enc) rows as REAL ID3v2 tags
    * (followed by deterministic filler "audio"): `v` selects ID3v2.3
    * (plain 32-bit frame sizes) or v2.4 (syncsafe frame sizes) — the two
    * wild formats; `enc` selects the text encoding byte 0=Latin-1,
    * 1=UTF-16 with BOM, 3=UTF-8. Fixture generator for q110 and specs.
    */
  def encodeId3s(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("id").cast("long"), col("title"), col("artist"), col("album"),
        col("v").cast("int"), col("enc").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val v = r.getInt(4)
          val enc = r.getInt(5)
          def textBytes(s: String): Array[Byte] = enc match {
            case 0 => s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
            case 1 => Array[Byte](0xFF.toByte, 0xFE.toByte) ++
              s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
            case _ => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          def frame(fid: String, text: String): Array[Byte] = {
            val body = (if (enc == 1) 1 else if (enc == 0) 0 else 3).toByte +:
              textBytes(text)
            val sz = body.length
            val szBytes =
              if (v == 4) Array[Byte](((sz >> 21) & 0x7F).toByte,
                ((sz >> 14) & 0x7F).toByte, ((sz >> 7) & 0x7F).toByte,
                (sz & 0x7F).toByte)
              else Array[Byte](((sz >> 24) & 0xFF).toByte, ((sz >> 16) & 0xFF).toByte,
                ((sz >> 8) & 0xFF).toByte, (sz & 0xFF).toByte)
            fid.getBytes("US-ASCII") ++ szBytes ++ Array[Byte](0, 0) ++ body
          }
          val frames = frame("TIT2", r.getString(1)) ++
            frame("TPE1", r.getString(2)) ++ frame("TALB", r.getString(3))
          val total = frames.length
          val out = new java.io.ByteArrayOutputStream()
          out.write("ID3".getBytes("US-ASCII"))
          out.write(v); out.write(0); out.write(0) // version, revision, flags
          out.write((total >> 21) & 0x7F); out.write((total >> 14) & 0x7F)
          out.write((total >> 7) & 0x7F); out.write(total & 0x7F)
          out.write(frames)
          var i = 0
          while (i < 32) { out.write((i * 29 + 5) & 0xFF); i += 1 }
          Row(r.getLong(0), out.toByteArray)
        }
      }(encoder)
  }

  /** REAL ID3v2 tag decode: validate the 10-byte header, walk the frame
    * chain (v2.4 syncsafe vs v2.3 plain 32-bit sizes — mixing them up
    * desyncs the walk on any frame over 127 bytes), and decode the text
    * frames TIT2/TPE1/TALB honoring the per-frame encoding byte
    * (Latin-1 / UTF-16-BOM / UTF-16BE / UTF-8). Untagged payloads keep
    * their row with null fields.
    *
    * Output: (media_id, tag_version, title, artist, album).
    */
  def decodeId3Tags(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("tag_version", StringType, nullable = true),
      StructField("title", StringType, nullable = true),
      StructField("artist", StringType, nullable = true),
      StructField("album", StringType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
            Row(id, null, null, null, null)
          else {
            val major = b(3) & 0xFF
            val tagEnd = math.min(b.length,
              10 + (((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
                ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)))
            var title: String = null; var artist: String = null
            var album: String = null
            // ID3v2.2 (the pre-1999 format still common on old rips):
            // 3-char frame ids + 3-byte big-endian sizes, 6-byte headers;
            // v2.3/v2.4 use 4+4-byte headers (v2.4 sizes syncsafe)
            val hdrLen = if (major == 2) 6 else 10
            var pos = 10
            var ok = true
            while (ok && pos + hdrLen <= tagEnd) {
              val fid = new String(b, pos, if (major == 2) 3 else 4, "US-ASCII")
              if (fid(0) == 0) ok = false // zero padding reached
              else {
                val sz =
                  if (major == 2) ((b(pos + 3) & 0xFF) << 16) |
                    ((b(pos + 4) & 0xFF) << 8) | (b(pos + 5) & 0xFF)
                  else if (major >= 4) ((b(pos + 4) & 0x7F) << 21) | ((b(pos + 5) & 0x7F) << 14) |
                    ((b(pos + 6) & 0x7F) << 7) | (b(pos + 7) & 0x7F)
                  else ((b(pos + 4) & 0xFF) << 24) | ((b(pos + 5) & 0xFF) << 16) |
                    ((b(pos + 6) & 0xFF) << 8) | (b(pos + 7) & 0xFF)
                // overflow-safe form: pos + hdrLen + sz can wrap an Int
                // on a hostile 0x7FFFFFFF size and slip past a direct
                // comparison, crashing the never-fail decode contract
                if (sz < 0 || sz > tagEnd - pos - hdrLen) ok = false
                else {
                  if (fid.charAt(0) == 'T' && sz >= 1) {
                    val encByte = b(pos + hdrLen) & 0xFF
                    val cs = encByte match {
                      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
                      case 1 => java.nio.charset.Charset.forName("UTF-16")  // BOM
                      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
                      case _ => java.nio.charset.StandardCharsets.UTF_8
                    }
                    val start = pos + hdrLen + 1
                    var end = pos + hdrLen + sz
                    // strip ONE optional null terminator, sized by the
                    // encoding (a lone trailing 0x00 in UTF-16LE text is
                    // part of the final character, not a terminator)
                    if (encByte == 1 || encByte == 2) {
                      if (end - start >= 2 && b(end - 1) == 0 && b(end - 2) == 0) end -= 2
                    } else if (end - start >= 1 && b(end - 1) == 0) end -= 1
                    val text = new String(b, start, end - start, cs)
                    fid match {
                      case "TIT2" | "TT2" => title = text
                      case "TPE1" | "TP1" => artist = text
                      case "TALB" | "TAL" => album = text
                      case _ => ()
                    }
                  }
                  pos += hdrLen + sz
                }
              }
            }
            if (title == null && artist == null && album == null)
              Row(id, null, null, null, null)
            else Row(id, s"2.$major", title, artist, album)
          }
        }
      }(encoder)
  }

  // ---- Ogg / Vorbis -------------------------------------------------------

  /** Encode (id, sample_rate, channels, total_samples, n_pages) rows as
    * REAL Ogg byte streams (RFC 3533 page framing): page 0 carries the
    * Vorbis identification header (BOS), followed by `n_pages` audio pages
    * with deterministic filler whose granule positions step evenly to
    * `total_samples` on the final (EOS) page. CRCs are left zero — the
    * decoder must tolerate unchecked CRCs exactly like real scrapers do
    * with damaged files. Fixture generator for q108 and specs.
    */
  def encodeOggs(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("id").cast("long"), col("sample_rate").cast("int"),
        col("channels").cast("int"), col("total_samples").cast("long"),
        col("n_pages").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val sr = r.getInt(1); val ch = r.getInt(2)
          val total = r.getLong(3); val nPages = math.max(1, r.getInt(4))
          val le = java.nio.ByteOrder.LITTLE_ENDIAN
          val out = new java.io.ByteArrayOutputStream()
          def page(granule: Long, headerType: Int, seq: Int,
              segments: Array[Array[Byte]]): Unit = {
            val b = java.nio.ByteBuffer
              .allocate(27 + segments.length + segments.map(_.length).sum).order(le)
            b.put("OggS".getBytes("US-ASCII"))
            b.put(0.toByte)                  // stream structure version
            b.put(headerType.toByte)         // 2 = BOS, 4 = EOS
            b.putLong(granule)
            b.putInt(0x6772616F)             // serial
            b.putInt(seq)
            b.putInt(0)                      // CRC unset (tolerated)
            b.put(segments.length.toByte)
            segments.foreach(s => b.put(s.length.toByte))
            segments.foreach(b.put)
            out.write(b.array())
          }
          // Vorbis identification header: \x01 "vorbis" ver ch sr ...
          val idh = java.nio.ByteBuffer.allocate(30).order(le)
          idh.put(1.toByte); idh.put("vorbis".getBytes("US-ASCII"))
          idh.putInt(0)                      // vorbis_version
          idh.put(ch.toByte)
          idh.putInt(sr)
          idh.putInt(0); idh.putInt(0); idh.putInt(0) // bitrates
          idh.put(0xB8.toByte)               // blocksizes
          idh.put(1.toByte)                  // framing bit
          page(0L, 2, 0, Array(idh.array()))
          var p = 1
          while (p <= nPages) {
            val granule = total * p / nPages
            val body = Array.tabulate[Byte](40 + (p % 3) * 7)(i => ((p * 31 + i * 7) & 0xFF).toByte)
            page(granule, if (p == nPages) 4 else 0, p, Array(body))
            p += 1
          }
          Row(r.getLong(0), out.toByteArray)
        }
      }(encoder)
  }

  /** REAL Ogg/Vorbis METADATA decode: walk the RFC 3533 page chain by
    * each page's segment table (27-byte header + lacing values), read
    * channels + sample rate from the Vorbis identification header on the
    * BOS page, and total samples from the LAST page's granule position —
    * the walk must size every page correctly or it desyncs. CRCs are not
    * verified (scraped files are routinely damaged; framing is the
    * authority). Non-Ogg / truncated payloads keep their row with null
    * fields.
    *
    * Output: (media_id, channels, sample_rate, total_samples, n_pages,
    * duration_ms).
    */
  def decodeOggMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("total_samples", LongType, nullable = true),
      StructField("n_pages", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          def le32(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
            ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
          def le64(i: Int): Long = (le32(i) & 0xFFFFFFFFL) | (le32(i + 4).toLong << 32)
          var pos = 0
          var ch = 0; var sr = 0
          var granule = -1L
          var nPages = 0L
          var ok = true
          while (ok && pos + 27 <= b.length) {
            if (b(pos) != 'O' || b(pos + 1) != 'g' || b(pos + 2) != 'g' ||
              b(pos + 3) != 'S' || b(pos + 4) != 0) ok = false
            else {
              val pageGranule = le64(pos + 6)
              val nSegs = b(pos + 26) & 0xFF
              if (pos + 27 + nSegs > b.length) ok = false
              else {
                var bodyLen = 0
                var s = 0
                while (s < nSegs) { bodyLen += b(pos + 27 + s) & 0xFF; s += 1 }
                val body = pos + 27 + nSegs
                if (body + bodyLen > b.length) ok = false
                else {
                  // Vorbis identification header on the first page
                  if (nPages == 0 && bodyLen >= 16 && b(body) == 1 &&
                    b(body + 1) == 'v' && b(body + 2) == 'o' && b(body + 3) == 'r' &&
                    b(body + 4) == 'b' && b(body + 5) == 'i' && b(body + 6) == 's') {
                    ch = b(body + 11) & 0xFF
                    sr = le32(body + 12)
                  }
                  // a CONTINUED page on which no packet completes carries
                  // granule -1 (all-ones) — it must not clobber the last
                  // real position, or a stream ending on a continued page
                  // reads a negative duration
                  if (pageGranule != -1L) granule = pageGranule
                  nPages += 1
                  pos = body + bodyLen
                }
              }
            }
          }
          if (nPages == 0 || sr <= 0) Row(id, null, null, null, null, null)
          else Row(id, ch, sr, granule, nPages,
            if (granule >= 0) Long.box(granule * 1000L / sr) else null)
        }
      }(encoder)
  }
}
