package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs, plus batched decode / feature-extract /
  * frame-sample operators over `mapPartitions`.
  *
  * DOCUMENT payloads (PDF/DOCX) decode for real through
  * [[DocumentCodec]] (`parseDocuments` below) — pure JVM, no external
  * libraries. The image/audio FEATURE step stays a deterministic stand-in
  * (this container has no pixel/sample codecs); its Spark side — schemas,
  * partition-level batching, operator signatures, binaryFile ingestion —
  * is real. The reference's analog is the embedded-image
  * extract→validate→upload pipeline (多数据源获取数据.py:396-445,
  * 1116-1178) with its ≥5 KiB / ≥50 px gates.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),   // image|audio|video
    StructField("format", StringType, nullable = true),        // png|wav|mp4|…
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", mediaMetaSchema, nullable = false)))

  /** Ingest a directory of opaque files as media rows (binaryFile source —
    * S5's Spark-native entry point; at scale this is the parallel,
    * prunable way to lift blobs into the engine).
    */
  def readBinaryDir(spark: SparkSession, path: String, mediaType: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content").as("payload"),
        struct(
          lit(mediaType).as("media_type"),
          lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("format"),
          length(col("content")).cast("long").as("byte_len"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** The reference's image-block gate (P12): ≥ minBytes and ≥ minDim px.
    * Since r4 the dimensions come from the REAL encoded header when the
    * payload is a decodable PNG/JPEG/GIF (compiled
    * [[graft.functions.ImageDims]] kernel — the pure-JVM half of the
    * reference's PIL `Image.open` validation, DATA:396-445); the metadata
    * columns are only the DIMENSION fallback for payloads that are not
    * image streams; the byte gate always runs on `length(payload)` (the
    * reference's `len(blob)` over real bytes — carried `meta.byte_len`
    * can lie, same contract as the strict variant). A payload whose
    * header CLAIMS other dims than its metadata is judged by its bytes.
    */
  /** A temp-column name not colliding with anything already on `df`. */
  private def freshName(df: DataFrame, base: String): String = {
    var n = base
    var i = 0
    while (df.columns.contains(n)) { i += 1; n = base + "_" + i }
    n
  }

  def validMediaFilter(df: DataFrame, minBytes: Long = 5120, minDim: Int = 50): DataFrame = {
    // project the packed kernel value ONCE per row — the predicate below
    // references it four times, and interpreted evaluation (codegen off /
    // over budget) would otherwise re-parse the header per reference.
    // Collision-safe temp name: a caller's own __img_dims column survives.
    val tmp = freshName(df, "__img_dims")
    val packed = col(tmp)
    val w = coalesce(graft.functions.ImageDims.widthOf(packed), col("meta.width"))
    val h = coalesce(graft.functions.ImageDims.heightOf(packed), col("meta.height"))
    df.withColumn(tmp, graft.functions.ImageDims.expr(col("payload")))
      .filter(length(col("payload")) >= minBytes &&
        (w.isNull || w >= minDim) && (h.isNull || h >= minDim))
      .drop(tmp)
  }

  /** Strict image gate: the payload must actually PARSE as PNG/JPEG/GIF
    * (the reference's "PIL must open it" contract) AND meet the size
    * gates. Use for rows claiming image media_type. The byte gate runs on
    * the ACTUAL payload length (the reference's `len(blob)` over real
    * bytes, DATA:396-445) — carried metadata can lie and is not consulted.
    */
  def validImageFilter(df: DataFrame, minBytes: Long = 5120, minDim: Int = 50): DataFrame = {
    val tmp = freshName(df, "__img_dims")
    val packed = col(tmp)
    df.withColumn(tmp, graft.functions.ImageDims.expr(col("payload")))
      .filter(length(col("payload")) >= minBytes &&
        packed.isNotNull &&
        graft.functions.ImageDims.widthOf(packed) >= minDim &&
        graft.functions.ImageDims.heightOf(packed) >= minDim)
      .drop(tmp)
  }

  /** Decoded-from-bytes image columns: format/width/height from the real
    * header (null for non-image payloads), alongside the carried metadata.
    */
  def imageMeta(df: DataFrame): DataFrame = {
    val packed = graft.functions.ImageDims.expr(col("payload"))
    df.withColumn("img_format", graft.functions.ImageDims.formatOf(packed))
      .withColumn("img_width", graft.functions.ImageDims.widthOf(packed))
      .withColumn("img_height", graft.functions.ImageDims.heightOf(packed))
  }

  /** STUB decode for VIDEO frames only — the one media class the JDK has
    * no codec for. The deterministic fake derives pseudo-features from the
    * bytes so the distributed plumbing (batching, schema, shuffle behavior)
    * is fully exercised and testable.
    */
  private def fakeVideoFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1469598103934665603L // FNV offset basis — stand-in only
    var i = 0
    while (i < payload.length) {
      acc = (acc ^ payload(i)) * 1099511628211L
      out(math.abs((acc % dim).toInt)) += 1.0f
      i += 1
    }
    val n = math.max(1, payload.length)
    out.map(_ / n)
  }

  /** VIDEO-frame feature seam over batched partitions: one codec init per
    * partition (the expensive part a real decoder amortizes), rows
    * streamed through it — the mapInPandas-batch shape in Scala. HARD-
    * GATED to `meta.media_type == "video"` payloads in codecs the JDK
    * cannot decode: image and audio payloads have REAL decoders
    * ([[decodeImages]]/[[decodeAudio]]/[[decodeMp3Meta]]), and since r5
    * so do AVI (DIB/MJPEG) and multi-frame GIF video containers
    * ([[decodeVideoFrames]]) — any of those reaching this stand-in fails
    * the job with a pointer to the real path. What remains behind the
    * seam is spectral decode of compressed codecs (H.264/VP9/…).
    */
  def videoFeatureSeam(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"), col("meta.media_type"))
      .mapPartitions { rows =>
        // per-partition "codec" init happens here in a real implementation
        rows.map { r =>
          val mt = r.getString(2)
          if (mt != "video")
            throw new IllegalArgumentException(
              s"videoFeatureSeam covers only media_type 'video' (got '$mt'): " +
                "decodable media must use the real decoders — decodeImages / " +
                "decodeAudio / decodeMp3Meta")
          val payload = r.getAs[Array[Byte]](1)
          val decodableAvi = payload.length >= 12 &&
            payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
            payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
            payload(10) == 'I'
          val decodableGif = payload.length >= 6 &&
            payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F'
          if (decodableAvi || decodableGif)
            throw new IllegalArgumentException(
              "videoFeatureSeam received a decodable video container " +
                s"(${if (decodableAvi) "AVI" else "GIF"}): frame-decodable " +
                "video must use the real decoder — decodeVideoFrames")
          Row(r.getLong(0), fakeVideoFeatures(payload, dim).toSeq)
        }
      }(encoder)
  }

  /** S5 document parse: decode PDF/DOCX payloads to text on executors
    * (DocumentCodec), batched per partition like extractFeatures. Output:
    * (media_id, doc_format, text nullable, n_chars) — an undecodable or
    * unsupported payload keeps its row with a null text (the caller's
    * filter decides), never fails the job.
    */
  def parseDocuments(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("doc_format", StringType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("n_chars", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          // dispatch ONCE — detect + extract, not detect twice (zip
          // directory scans are the per-row cost here)
          val fmt = DocumentCodec.detectFormat(payload)
          val text = fmt match {
            case DocumentCodec.Docx => DocumentCodec.extractDocx(payload)
            case DocumentCodec.Pdf => DocumentCodec.extractPdf(payload)
            case DocumentCodec.Pptx => DocumentCodec.extractPptx(payload)
            case DocumentCodec.LegacyOffice => Ole2.extractText(payload)
            case DocumentCodec.Unknown => None
          }
          Row(r.getLong(0), fmt.name, text.orNull,
            text.map(_.length.toLong).map(Long.box).orNull)
        }
      }(encoder)
  }

  /** Encode (id, f, w, h[, r, g, b]) rows into REAL image byte streams on
    * executors (javax.imageio, pure JVM) — the deterministic byte-fixture
    * generator for the image oracles (q93/q97) and specs. `f`: 0=png
    * 1=jpeg 2=gif; fill color defaults to black when r/g/b are absent.
    * Output: (id, payload). Runs in mapPartitions like parseDocuments —
    * encoding is embarrassingly parallel, nothing touches the driver.
    */
  def encodeImages(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    def colOr0(n: String): Column =
      if (df.columns.contains(n)) col(n).cast("int") else lit(0)
    df.select(col("id").cast("long"), col("f").cast("int"),
        col("w").cast("int"), col("h").cast("int"),
        colOr0("r"), colOr0("g"), colOr0("b"))
      .mapPartitions { rows =>
        rows.map { r =>
          val fmt = r.getInt(1) match {
            case 0 => "png"
            case 1 => "jpg"
            case 3 => "tiff" // JDK imageio ships the TIFF plugin since 9
            case _ => "gif"
          }
          val img = new java.awt.image.BufferedImage(r.getInt(2), r.getInt(3),
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = img.createGraphics()
          g2.setColor(new java.awt.Color(r.getInt(4), r.getInt(5), r.getInt(6)))
          g2.fillRect(0, 0, r.getInt(2), r.getInt(3))
          g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }(encoder)
  }

  /** REAL pixel decode (javax.imageio — PNG/JPEG/GIF/BMP readers ship in
    * every JDK): width/height, per-channel means, and a 64-bit dHash
    * (9×8 nearest-neighbor luminance grid, adjacent-column compare) from
    * the ACTUAL decoded pixels. This retires the fake-featurizer seam for
    * image payloads — the reference's PIL validate/feature step
    * (多数据源获取数据.py:396-445) runs for real here. Undecodable
    * payloads keep their row with null fields (the caller's filter
    * decides), never fail the job.
    *
    * Output: (media_id, img_w, img_h, mean_r, mean_g, mean_b, dhash).
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("img_w", IntegerType, nullable = true),
      StructField("img_h", IntegerType, nullable = true),
      StructField("mean_r", IntegerType, nullable = true),
      StructField("mean_g", IntegerType, nullable = true),
      StructField("mean_b", IntegerType, nullable = true),
      StructField("dhash", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            if (img == null) Row(id, null, null, null, null, null, null)
            else {
              val w = img.getWidth
              val h = img.getHeight
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < px.length) {
                sr += (px(i) >> 16) & 0xFF; sg += (px(i) >> 8) & 0xFF
                sb += px(i) & 0xFF
                i += 1
              }
              val n = px.length.toLong
              // dHash: integer nearest-neighbor 9×8 luminance grid —
              // platform-independent (no Graphics scaling filters)
              def lum(gx: Int, gy: Int): Int = {
                val x = math.min(w - 1, gx * w / 9)
                val y = math.min(h - 1, gy * h / 8)
                val p = px(y * w + x)
                (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
                  114 * (p & 0xFF)) / 1000
              }
              var sig = 0L
              var gy = 0
              while (gy < 8) {
                var gx = 0
                while (gx < 8) {
                  if (lum(gx + 1, gy) > lum(gx, gy)) sig |= 1L << (gy * 8 + gx)
                  gx += 1
                }
                gy += 1
              }
              Row(id, w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, sig)
            }
          } catch {
            case _: Exception => Row(id, null, null, null, null, null, null)
          }
        }
      }(encoder)
  }

  /** Encode (id, n, k) rows as REAL 16-bit mono PCM WAV byte streams
    * (hand-rolled RIFF container, deterministic integer sawtooth samples
    * `((i·k·37) mod 65536) − 32768`) — the audio byte-fixture generator
    * for q98 and specs. Runs on executors like encodeImages.
    */
  def encodeWavs(df: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("id").cast("long"), col("n").cast("int"), col("k").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.getInt(1)
          val k = r.getInt(2)
          val dataLen = n * 2
          val b = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put("RIFF".getBytes("US-ASCII")); b.putInt(36 + dataLen)
          b.put("WAVE".getBytes("US-ASCII"))
          b.put("fmt ".getBytes("US-ASCII")); b.putInt(16)
          b.putShort(1)                     // PCM
          b.putShort(1)                     // mono
          b.putInt(sampleRate)
          b.putInt(sampleRate * 2)          // byte rate
          b.putShort(2)                     // block align
          b.putShort(16)                    // bits/sample
          b.put("data".getBytes("US-ASCII")); b.putInt(dataLen)
          var i = 0
          while (i < n) {
            b.putShort((((i.toLong * k * 37) % 65536) - 32768).toShort)
            i += 1
          }
          Row(r.getLong(0), b.array())
        }
      }(encoder)
  }

  /** REAL audio decode (javax.sound.sampled — WAV/AIFF/AU PCM readers
    * ship in the JDK): sample rate, channel count, sample count, exact
    * sum of squared samples (the RMS numerator, exact integer → hashable)
    * and peak amplitude from the ACTUAL decoded frames. Compressed
    * codecs stay out of JDK scope — route MP3 payloads to
    * [[decodeMp3Meta]] for a real frame-header metadata walk; undecodable
    * payloads keep their row with null fields.
    *
    * Output: (media_id, sample_rate, n_channels, n_samples, sum_sq, peak).
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_channels", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_sq", LongType, nullable = true),
      StructField("peak", IntegerType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16)
              Row(id, null, null, null, null, null)
            else {
              val bytes = ais.readAllBytes()
              val buf = java.nio.ByteBuffer.wrap(bytes).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              var sumSq = 0L
              var peak = 0
              var n = 0L
              while (buf.remaining() >= 2) {
                val s = buf.getShort.toInt
                sumSq += s.toLong * s
                if (math.abs(s) > peak) peak = math.abs(s)
                n += 1
              }
              Row(id, fmt.getSampleRate.toInt, fmt.getChannels,
                n / fmt.getChannels, sumSq, peak)
            }
          } catch {
            case _: Exception => Row(id, null, null, null, null, null)
          }
        }
      }(encoder)
  }

  /** Audio near-dup fingerprint from REAL decoded PCM — the audio leg of
    * the modality near-dup matrix (text MinHash/SimHash, image/video
    * dHash, audio THIS): per-frame energy (exact integer Σs² over
    * `frameSamples`-sample windows, tail partial frame dropped), then a
    * 64-bit signature with bit f set iff energy(f+1) > energy(f) — the
    * energy-contour sign profile, robust to uniform gain the way dHash is
    * to brightness. Feed `fp` to `Dedup.hammingNearDupPairs` for banded
    * audio near-dup exactly like the image path.
    *
    * All-integer arithmetic (q148's oracle replays the energies sample
    * for sample). Undecodable/short (< 2 frames) payloads keep their row
    * with null fields.
    *
    * Output: (media_id, n_frames, fp).
    */
  def audioFingerprint(media: DataFrame, frameSamples: Int = 256): DataFrame = {
    require(frameSamples >= 1, "frameSamples must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("fp", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16) Row(id, null, null)
            else {
              val bytes = ais.readAllBytes()
              val buf = java.nio.ByteBuffer.wrap(bytes).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              val nSamples = buf.remaining() / 2
              val nFrames = nSamples / frameSamples
              if (nFrames < 2) Row(id, null, null)
              else {
                val energies = new Array[Long](nFrames)
                var f = 0
                while (f < nFrames) {
                  var e = 0L
                  var i = 0
                  while (i < frameSamples) {
                    val s = buf.getShort.toLong
                    e += s * s
                    i += 1
                  }
                  energies(f) = e
                  f += 1
                }
                var fp = 0L
                var b = 0
                val bits = math.min(nFrames - 1, 64)
                while (b < bits) {
                  if (energies(b + 1) > energies(b)) fp |= 1L << b
                  b += 1
                }
                Row(id, nFrames, fp)
              }
            }
          } catch {
            case _: Exception => Row(id, null, null)
          }
        }
      }(encoder)
  }

  // ---- MP3 frame-header metadata (compressed-audio seam, shrunk) ----------

  /** Bitrate tables, kbps, indexed 1..14 (0 = free, 15 = bad) — ISO 11172-3
    * / 13818-3 Layer III columns. MPEG2.5 shares the MPEG2 column.
    */
  private val Mp3BitratesV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitratesV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3SampleRatesV1 = Array(44100, 48000, 32000)
  private val Mp3SampleRatesV2 = Array(22050, 24000, 16000)
  private val Mp3SampleRatesV25 = Array(11025, 12000, 8000)

  /** Encode (id, v, n_frames, br_idx, sr_idx, id3_len) rows as REAL MPEG
    * Layer III byte streams: an ID3v2.4 tag of `id3_len` payload bytes
    * (syncsafe size) followed by `n_frames` CBR frames — valid sync,
    * version (`v`: 1 or 2), layer, bitrate/samplerate indices, padding 0,
    * deterministic filler bytes. The audio-fixture generator for q101 and
    * specs; runs on executors like encodeWavs.
    */
  def encodeMp3s(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("id").cast("long"), col("v").cast("int"),
        col("n_frames").cast("int"), col("br_idx").cast("int"),
        col("sr_idx").cast("int"), col("id3_len").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val v = r.getInt(1)
          val nFrames = r.getInt(2)
          val brIdx = r.getInt(3)
          val srIdx = r.getInt(4)
          val id3Len = r.getInt(5)
          val br = (if (v == 1) Mp3BitratesV1L3 else Mp3BitratesV2L3)(brIdx) * 1000
          val sr = (if (v == 1) Mp3SampleRatesV1 else Mp3SampleRatesV2)(srIdx)
          // Layer III frame bytes = samplesPerFrame/8 · bitrate / sampleRate
          val frameLen = (if (v == 1) 144 else 72) * br / sr
          val out = new java.io.ByteArrayOutputStream()
          if (id3Len > 0) {
            out.write("ID3".getBytes("US-ASCII"))
            out.write(4); out.write(0); out.write(0)        // v2.4, flags 0
            out.write((id3Len >> 21) & 0x7F); out.write((id3Len >> 14) & 0x7F)
            out.write((id3Len >> 7) & 0x7F); out.write(id3Len & 0x7F)
            var i = 0
            while (i < id3Len) { out.write((i * 31 + 7) & 0x7F); i += 1 }
          }
          val verBits = if (v == 1) 3 else 2                 // 11=MPEG1 10=MPEG2
          var f = 0
          while (f < nFrames) {
            out.write(0xFF)
            out.write(0xE0 | (verBits << 3) | (1 << 1) | 1)  // sync|ver|L3|noCRC
            out.write((brIdx << 4) | (srIdx << 2))           // bitrate|sr|pad 0
            out.write(0xC0)                                  // single channel
            var i = 4
            while (i < frameLen) { out.write((f * 131 + i * 17) & 0xFF); i += 1 }
            f += 1
          }
          Row(r.getLong(0), out.toByteArray)
        }
      }(encoder)
  }

  /** REAL MP3 METADATA decode — a pure-JVM MPEG frame-header walk (the
    * compressed-audio analog of the q99 box walk): skip an ID3v2 tag by
    * its syncsafe size, then step frame to frame validating the 11-bit
    * sync and reading version/layer/bitrate/samplerate from each 4-byte
    * header; frame length is pure arithmetic, so a wrong table desyncs the
    * walk immediately. Reports first-frame (CBR) bitrate and the exact
    * integer duration `n_frames · samplesPerFrame · 1000 / sampleRate`.
    * The frame BODY stays undecoded — the JDK has no MP3 codec; this
    * shrinks the seam to the psychoacoustic decode itself, reference
    * analog: the format-sniffing chain (多数据源获取数据.py:1384-1447).
    * Non-MP3 / truncated payloads keep their row with null fields.
    *
    * Output: (media_id, mpeg_version, layer, bitrate_kbps, sample_rate,
    * n_frames, n_samples, duration_ms).
    */
  def decodeMp3Meta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mpeg_version", StringType, nullable = true),
      StructField("layer", IntegerType, nullable = true),
      StructField("bitrate_kbps", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          var pos = 0
          // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
          if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
            val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
              ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
            pos = 10 + sz
          }
          var ver = ""
          var layer = 0
          var kbps = 0
          var sr = 0
          var nFrames = 0L
          var nSamples = 0L
          var ok = true
          while (ok && pos + 4 <= b.length) {
            val h1 = b(pos) & 0xFF; val h2 = b(pos + 1) & 0xFF
            if (h1 != 0xFF || (h2 & 0xE0) != 0xE0) ok = false
            else {
              val verBits = (h2 >> 3) & 3      // 0=2.5 1=res 2=MPEG2 3=MPEG1
              val layerBits = (h2 >> 1) & 3    // 1=III 2=II 3=I
              val brIdx = (b(pos + 2) >> 4) & 0xF
              val srIdx = (b(pos + 2) >> 2) & 3
              val pad = (b(pos + 2) >> 1) & 1
              if (verBits == 1 || layerBits != 1 || brIdx == 0 || brIdx == 15 ||
                  srIdx == 3) ok = false       // Layer III CBR only (scope)
              else {
                val v1 = verBits == 3
                val fKbps = (if (v1) Mp3BitratesV1L3 else Mp3BitratesV2L3)(brIdx)
                val fSr = (verBits match {
                  case 3 => Mp3SampleRatesV1
                  case 2 => Mp3SampleRatesV2
                  case _ => Mp3SampleRatesV25
                })(srIdx)
                val spf = if (v1) 1152 else 576
                val frameLen = spf / 8 * (fKbps * 1000) / fSr + pad
                if (frameLen < 4 || pos + frameLen > b.length) ok = false
                else {
                  if (nFrames == 0) {
                    ver = verBits match {
                      case 3 => "1"
                      case 2 => "2"
                      case _ => "2.5"
                    }
                    layer = 3; kbps = fKbps; sr = fSr
                  }
                  nFrames += 1
                  nSamples += spf
                  pos += frameLen
                }
              }
            }
          }
          if (nFrames == 0) Row(id, null, null, null, null, null, null, null)
          else Row(id, ver, layer, kbps, sr, nFrames, nSamples,
            nSamples * 1000L / sr)
        }
      }(encoder)
  }

  // ---- AAC ADTS frame-header metadata (compressed-audio seam, shrunk) -----

  /** ISO 14496-3 sampling_frequency_index table (0..12). */
  private val AdtsSampleRates = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** Encode (id, mpeg_id, profile, sr_idx, channels, n_frames, base_len)
    * rows as REAL AAC ADTS byte streams: `n_frames` frames, each a valid
    * 7-byte header (syncword, MPEG-2/4 id, profile, sampling index,
    * channel config, per-frame 13-bit frame_length) + deterministic filler
    * payload. AAC is VBR by design, so frame f's length is
    * `base_len + 9·(f mod 7)` — the walk must read EVERY header, not
    * stride by a constant. The audio-fixture generator for q104 and specs.
    */
  def encodeAdts(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("id").cast("long"), col("mpeg_id").cast("int"),
        col("profile").cast("int"), col("sr_idx").cast("int"),
        col("channels").cast("int"), col("n_frames").cast("int"),
        col("base_len").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          val mpegId = r.getInt(1)   // 0 = MPEG-4, 1 = MPEG-2
          val profile = r.getInt(2)  // 0 = Main, 1 = LC, 2 = SSR (AOT - 1)
          val srIdx = r.getInt(3)
          val chan = r.getInt(4)
          val nFrames = r.getInt(5)
          val baseLen = r.getInt(6)
          val out = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < nFrames) {
            val frameLen = baseLen + 9 * (f % 7) // incl. the 7-byte header
            out.write(0xFF)
            out.write(0xF0 | (mpegId << 3) | 1)          // sync|id|layer 00|noCRC
            out.write((profile << 6) | (srIdx << 2) | (chan >> 2))
            out.write(((chan & 3) << 6) | ((frameLen >> 11) & 3))
            out.write((frameLen >> 3) & 0xFF)
            out.write(((frameLen & 7) << 5) | 0x1F)      // fullness hi = VBR
            out.write(0xFC)                              // fullness lo | 1 block
            var i = 7
            while (i < frameLen) { out.write((f * 37 + i * 11) & 0xFF); i += 1 }
            f += 1
          }
          Row(r.getLong(0), out.toByteArray)
        }
      }(encoder)
  }

  /** REAL AAC ADTS METADATA decode — the MPEG-4 sibling of
    * [[decodeMp3Meta]]: step frame to frame validating the 12-bit sync and
    * layer==0, reading MPEG id / profile (AOT) / sampling index / channel
    * config from the first header and the 13-bit frame_length from every
    * header (ADTS is VBR — each header declares its own frame's length, so
    * one wrong bit offset desyncs the walk immediately). 1024 PCM samples
    * per frame per raw block (fixtures use one block, the overwhelming
    * real-world case); duration is exact-integer
    * `n_frames · 1024 · 1000 / sampleRate`. The frame BODY stays undecoded
    * (no AAC codec in the JDK) — the seam is the spectral decode itself,
    * reference analog: the format-sniffing chain
    * (多数据源获取数据.py:1384-1447). Non-ADTS / truncated payloads keep
    * their row with null fields.
    *
    * Output: (media_id, mpeg_version, aot, sample_rate, channels,
    * n_frames, n_samples, duration_ms).
    */
  def decodeAdtsMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mpeg_version", StringType, nullable = true),
      StructField("aot", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          var pos = 0
          var ver = ""
          var aot = 0
          var sr = 0
          var chan = 0
          var nFrames = 0L
          var ok = true
          while (ok && pos + 7 <= b.length) {
            val h1 = b(pos) & 0xFF; val h2 = b(pos + 1) & 0xFF
            if (h1 != 0xFF || (h2 & 0xF6) != 0xF0) ok = false // sync + layer 00
            else {
              val srIdx = (b(pos + 2) >> 2) & 0xF
              if (srIdx >= AdtsSampleRates.length) ok = false
              else {
                val frameLen = ((b(pos + 3) & 3) << 11) |
                  ((b(pos + 4) & 0xFF) << 3) | ((b(pos + 5) >> 5) & 7)
                if (frameLen < 7 || pos + frameLen > b.length) ok = false
                else {
                  if (nFrames == 0) {
                    ver = if (((h2 >> 3) & 1) == 1) "2" else "4"
                    aot = ((b(pos + 2) >> 6) & 3) + 1
                    sr = AdtsSampleRates(srIdx)
                    chan = (((b(pos + 2) & 1) << 2) | ((b(pos + 3) >> 6) & 3))
                  }
                  nFrames += 1
                  pos += frameLen
                }
              }
            }
          }
          if (nFrames == 0) Row(id, null, null, null, null, null, null, null)
          else {
            val nSamples = nFrames * 1024L
            Row(id, ver, aot, sr, chan, nFrames, nSamples,
              nSamples * 1000L / sr)
          }
        }
      }(encoder)
  }

  /** Encode (id, timescale, dur_units, w, h) rows as minimal MP4
    * containers (ftyp + moov[mvhd + trak[tkhd]]) — the video byte-fixture
    * generator for q99 and specs. Box layout only; no media data, which
    * is exactly what the metadata parser consumes.
    */
  def encodeMp4s(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("id").cast("long"), col("timescale").cast("int"),
        col("dur_units").cast("long"), col("w").cast("int"), col("h").cast("int"))
      .mapPartitions { rows =>
        rows.map { r =>
          def box(typ: String, payload: Array[Byte]): Array[Byte] = {
            val b = java.nio.ByteBuffer.allocate(8 + payload.length)
            b.putInt(8 + payload.length)
            b.put(typ.getBytes("US-ASCII")); b.put(payload)
            b.array()
          }
          val mvhd = {
            val b = java.nio.ByteBuffer.allocate(100)
            b.putInt(0)                     // version+flags
            b.putInt(0); b.putInt(0)        // creation/modification
            b.putInt(r.getInt(1))           // timescale
            b.putInt(r.getLong(2).toInt)    // duration (units)
            b.array()
          }
          val tkhd = {
            val b = java.nio.ByteBuffer.allocate(84)
            b.putInt(0)                     // version+flags
            b.position(76)
            b.putInt(r.getInt(3) << 16)     // width 16.16
            b.putInt(r.getInt(4) << 16)     // height 16.16
            b.array()
          }
          val bytes = box("ftyp", "isom   isom".getBytes("US-ASCII")) ++
            box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
          Row(r.getLong(0), bytes)
        }
      }(encoder)
  }

  /** REAL MP4/QuickTime METADATA decode — a pure-JVM walk of the ISO
    * BMFF box tree (size+type headers; moov/trak containers descended):
    * movie timescale + duration from `mvhd`, presentation dims from the
    * first sized `tkhd` (16.16 fixed point), duration_ms by exact integer
    * math. Frame/pixel decode stays a seam (no video codec in the JDK) —
    * but container metadata no longer relies on trusted columns, matching
    * the image/audio posture. Undecodable payloads → null fields.
    *
    * Output: (media_id, duration_ms, timescale, width, height).
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = true),
      StructField("timescale", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val b = r.getAs[Array[Byte]](1)
            def be32(i: Int): Long =
              ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFF) << 16) |
                ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
            def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
            def typ(i: Int): String = new String(b, i + 4, 4, "US-ASCII")
            var timescale = 0
            var durUnits = -1L
            var w = 0
            var h = 0
            def walk(from: Int, to: Int): Unit = {
              var pos = from
              while (pos + 8 <= to) {
                // size 1 = 64-bit largesize follows the type; size 0 =
                // box extends to the end of the enclosing scope
                val size32 = be32(pos)
                val (size, hdr) =
                  if (size32 == 1 && pos + 16 <= to) (be64(pos + 8), 16L)
                  else if (size32 == 0) ((to - pos).toLong, 8L)
                  else (size32, 8L)
                if (size < hdr || pos + size > to) return // malformed: stop
                val body = pos + hdr.toInt
                // full boxes carry version+flags first; v1 layouts widen
                // the time fields to 64 bits (MS-ISO 14496-12 8.2.2/8.3.2)
                typ(pos) match {
                  case "moov" | "trak" => walk(body, pos + size.toInt)
                  case "mvhd" if size >= 28 =>
                    val v = b(body) & 0xFF
                    if (v == 1 && size >= hdr + 32) {
                      timescale = be32(body + 20).toInt
                      durUnits = be64(body + 24)
                    } else {
                      timescale = be32(body + 12).toInt
                      durUnits = be32(body + 16)
                    }
                  case "tkhd" if w == 0 =>
                    val v = b(body) & 0xFF
                    // v1 widens creation/modification/duration by 4 bytes
                    // each (+12 over v0's 76-byte prefix) → width/height
                    // land at body offsets 88/92, not 84/88
                    val (wOff, hOff) = if (v == 1) (88, 92) else (76, 80)
                    if (size >= hdr + hOff + 4) {
                      val tw = (be32(body + wOff) >> 16).toInt
                      val th = (be32(body + hOff) >> 16).toInt
                      if (tw > 0 && th > 0) { w = tw; h = th }
                    }
                  case _ => ()
                }
                pos += size.toInt
              }
            }
            walk(0, b.length)
            if (timescale <= 0 || durUnits < 0) Row(id, null, null, null, null)
            else Row(id, durUnits * 1000L / timescale, timescale,
              if (w > 0) Int.box(w) else null, if (h > 0) Int.box(h) else null)
          } catch {
            case _: Exception => Row(id, null, null, null, null)
          }
        }
      }(encoder)
  }

  // ---- AVI / GIF video FRAME decode (video seam, shrunk) ------------------

  /** Per-frame pixel statistics shared by the video frame decoders: exact
    * integer channel means and the same 9×8 integer dHash as
    * [[decodeImages]] (platform-independent nearest-neighbor grid).
    */
  private def frameStats(px: Array[Int], w: Int, h: Int): (Int, Int, Int, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      sr += (px(i) >> 16) & 0xFF; sg += (px(i) >> 8) & 0xFF
      sb += px(i) & 0xFF
      i += 1
    }
    val n = px.length.toLong
    def lum(gx: Int, gy: Int): Int = {
      val x = math.min(w - 1, gx * w / 9)
      val y = math.min(h - 1, gy * h / 8)
      val p = px(y * w + x)
      (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)) / 1000
    }
    var sig = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (lum(gx + 1, gy) > lum(gx, gy)) sig |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    ((sr / n).toInt, (sg / n).toInt, (sb / n).toInt, sig)
  }

  private val videoFrameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("container", StringType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("fps", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("frame_idx", IntegerType, nullable = true),
    StructField("frame_w", IntegerType, nullable = true),
    StructField("frame_h", IntegerType, nullable = true),
    StructField("mean_r", IntegerType, nullable = true),
    StructField("mean_g", IntegerType, nullable = true),
    StructField("mean_b", IntegerType, nullable = true),
    StructField("dhash", LongType, nullable = true)))

  private def nullFrameRow(id: Long): Row =
    Row(id, null, null, null, null, null, null, null, null, null, null, null)

  /** AVI ('MJPG' fourcc, little-endian) — the one compressed codec the JDK
    * CAN decode: each frame is a standalone JPEG.
    */
  private val MjpgFourcc = 0x47504A4D

  private def decodeAviFrames(id: Long, b: Array[Byte], stride: Int): Seq[Row] = {
    def le32(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    def le16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def fourcc(i: Int): String = new String(b, i, 4, "US-ASCII")
    var scale = 0; var rate = 0
    var bmpW = 0; var bmpH = 0; var bitCount = 0; var compression = -1
    var vidsSeen = false; var strfPending = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val cc = fourcc(pos)
        val size = le32(pos + 4)
        if (size < 0) return // malformed: stop
        if (cc == "LIST" && size >= 4 && pos + 12 <= to) {
          // clamp to available bytes: a truncated download still yields
          // its complete leading frames + headers
          val lt = fourcc(pos + 8)
          if (lt == "hdrl" || lt == "strl" || lt == "movi")
            walk(pos + 12, math.min(pos + 8L + size, to.toLong).toInt)
        } else if (pos + 8L + size > to) {
          return // truncated plain chunk: stop
        } else cc match {
          case "strh" if size >= 32 =>
            // first 'vids' stream wins; its strf is the frame format
            strfPending = fourcc(pos + 8) == "vids" && !vidsSeen
            if (strfPending) {
              scale = le32(pos + 8 + 20); rate = le32(pos + 8 + 24)
              vidsSeen = true
            }
          case "strf" if strfPending && size >= 40 =>
            bmpW = le32(pos + 8 + 4); bmpH = le32(pos + 8 + 8)
            bitCount = le16(pos + 8 + 14); compression = le32(pos + 8 + 16)
            strfPending = false
          case _ =>
            // video chunks of stream 0: raw DIB '00db' or compressed '00dc'
            if (cc == "00db" || cc == "00dc") frames += ((pos + 8, size))
        }
        // RIFF chunks are word-aligned; long math so a hostile size field
        // cannot overflow pos back into range
        val next = pos + 8L + size + (size & 1)
        if (next > to) return
        pos = next.toInt
      }
    }
    if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Seq(nullFrameRow(id))
    walk(12, b.length)
    val isMjpg = compression == MjpgFourcc
    if (!vidsSeen || frames.isEmpty || !(isMjpg || (compression == 0 && bitCount == 24)))
      return Seq(nullFrameRow(id))
    val nf = frames.length
    val fps: Integer =
      if (scale > 0 && rate > 0 && rate % scale == 0) Int.box(rate / scale) else null
    val durMs: java.lang.Long =
      if (scale > 0 && rate > 0) Long.box(nf.toLong * 1000L * scale / rate) else null
    val container = if (isMjpg) "avi-mjpg" else "avi-dib"
    (0 until nf by stride).flatMap { fi =>
      val (off, len) = frames(fi)
      if (isMjpg) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b, off, len))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val (mr, mg, mb, dh) = frameStats(img.getRGB(0, 0, w, h, null, 0, w), w, h)
          Some(Row(id, container, nf.toLong, fps, durMs, fi, w, h, mr, mg, mb, dh))
        }
      } else {
        // BI_RGB 24-bit DIB: BGR byte triples, rows padded to 4 bytes,
        // bottom-up when biHeight > 0 (top-down when negative)
        val w = bmpW
        val h = math.abs(bmpH)
        val rowBytes = (w * 3 + 3) & ~3
        if (w <= 0 || h == 0 || len < rowBytes * h) None
        else {
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            val srcRow = off + (if (bmpH > 0) (h - 1 - y) else y) * rowBytes
            var x = 0
            while (x < w) {
              val i = srcRow + x * 3
              px(y * w + x) = ((b(i + 2) & 0xFF) << 16) | ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
              x += 1
            }
            y += 1
          }
          val (mr, mg, mb, dh) = frameStats(px, w, h)
          Some(Row(id, container, nf.toLong, fps, durMs, fi, w, h, mr, mg, mb, dh))
        }
      }
    }
  }

  private def decodeGifFrames(id: Long, b: Array[Byte], stride: Int): Seq[Row] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq(nullFrameRow(id))
      val reader = readers.next()
      reader.setInput(iis)
      val nf = reader.getNumImages(true)
      if (nf <= 0) return Seq(nullFrameRow(id))
      (0 until nf by stride).map { fi =>
        val img = reader.read(fi)
        val w = img.getWidth; val h = img.getHeight
        val (mr, mg, mb, dh) = frameStats(img.getRGB(0, 0, w, h, null, 0, w), w, h)
        // GIF frame timing lives in per-frame extensions; fps/duration are
        // not a container constant → left null (n_frames is real)
        Row(id, "gif", nf.toLong, null, null, fi, w, h, mr, mg, mb, dh)
      }
    } finally iis.close()
  }

  /** REAL video FRAME decode for the containers a stock JVM can actually
    * decode: AVI with uncompressed BI_RGB DIB frames (pure-arithmetic BGR
    * row walk — bottom-up or top-down), AVI-MJPEG (every frame a
    * standalone JPEG → javax.imageio), and multi-frame GIF (the poor
    * man's video of the scraped web — javax.imageio's reader is
    * frame-indexed). Emits one row per SAMPLED frame (`frameStride`) with
    * exact integer channel means and the same 64-bit dHash as
    * [[decodeImages]] — so video near-dup rides the identical banded
    * hamming machinery as images. Container fps/duration come from the
    * AVI stream header (dwRate/dwScale), not trusted metadata columns.
    * Payloads in codecs the JDK cannot decode (H.264 in MP4, VP9, …) keep
    * one row with null fields — that spectral seam is
    * [[videoFeatureSeam]]'s; container METADATA for MP4 stays real via
    * [[decodeVideoMeta]]. Reference analog: the embedded-media
    * extract→validate pipeline (多数据源获取数据.py:396-445, 1116-1178).
    *
    * Output: (media_id, container, n_frames, fps, duration_ms, frame_idx,
    * frame_w, frame_h, mean_r, mean_g, mean_b, dhash).
    */
  def decodeVideoFrames(media: DataFrame, frameStride: Int = 1): DataFrame = {
    require(frameStride >= 1, s"frameStride must be >= 1 (got $frameStride)")
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoFrameSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          try {
            if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
              decodeGifFrames(id, b, frameStride)
            else decodeAviFrames(id, b, frameStride)
          } catch {
            case _: Exception => Seq(nullFrameRow(id))
          }
        }
      }(encoder)
  }

  /** Encode (id, w, h, n_frames, fps[, r0, g0, b0][, codec]) rows as REAL
    * AVI byte streams (RIFF container: avih + vids strh/strf + movi):
    * frame f is a solid fill of `((r0+11f) mod 256, (g0+5f) mod 256,
    * (b0+3f) mod 256)` — written as uncompressed bottom-up BI_RGB DIB
    * ('00db', codec 0, the default) or as MJPEG ('00dc', codec 1, each
    * frame a real JPEG via javax.imageio). The video byte-fixture
    * generator for q105 and specs; runs on executors like encodeImages.
    */
  def encodeAvis(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    def colOr0(n: String): Column =
      if (df.columns.contains(n)) col(n).cast("int") else lit(0)
    df.select(col("id").cast("long"), col("w").cast("int"), col("h").cast("int"),
        col("n_frames").cast("int"), col("fps").cast("int"),
        colOr0("r0"), colOr0("g0"), colOr0("b0"), colOr0("codec"))
      .mapPartitions { rows =>
        rows.map { r =>
          val w = r.getInt(1); val h = r.getInt(2)
          val nFrames = r.getInt(3); val fps = r.getInt(4)
          val r0 = r.getInt(5); val g0 = r.getInt(6); val b0 = r.getInt(7)
          val mjpg = r.getInt(8) == 1
          val le = java.nio.ByteOrder.LITTLE_ENDIAN
          def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
            val pad = payload.length & 1
            val b = java.nio.ByteBuffer.allocate(8 + payload.length + pad).order(le)
            b.put(cc.getBytes("US-ASCII")); b.putInt(payload.length); b.put(payload)
            b.array()
          }
          def list(lt: String, payload: Array[Byte]): Array[Byte] =
            chunk("LIST", lt.getBytes("US-ASCII") ++ payload)
          def frameBytes(f: Int): Array[Byte] = {
            val fr = (r0 + 11 * f) % 256; val fg = (g0 + 5 * f) % 256
            val fb = (b0 + 3 * f) % 256
            if (mjpg) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = img.createGraphics()
              g2.setColor(new java.awt.Color(fr, fg, fb))
              g2.fillRect(0, 0, w, h); g2.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "jpg", bos)
              bos.toByteArray
            } else {
              val rowBytes = (w * 3 + 3) & ~3
              val out = new Array[Byte](rowBytes * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val i = y * rowBytes + x * 3
                  out(i) = fb.toByte; out(i + 1) = fg.toByte; out(i + 2) = fr.toByte
                  x += 1
                }
                y += 1
              }
              out
            }
          }
          val bufSize = (w * 3 + 3 & ~3) * h
          val avih = {
            val b = java.nio.ByteBuffer.allocate(56).order(le)
            b.putInt(if (fps > 0) 1000000 / fps else 0) // usec/frame
            b.putInt(0); b.putInt(0); b.putInt(0)
            b.putInt(nFrames); b.putInt(0)
            b.putInt(1)                                 // one stream
            b.putInt(bufSize)
            b.putInt(w); b.putInt(h)
            b.array()
          }
          val strh = {
            val b = java.nio.ByteBuffer.allocate(56).order(le)
            b.put("vids".getBytes("US-ASCII"))
            b.put((if (mjpg) "MJPG" else "DIB ").getBytes("US-ASCII"))
            b.putInt(0); b.putInt(0); b.putInt(0)
            b.putInt(1)                                 // dwScale
            b.putInt(fps)                               // dwRate
            b.putInt(0); b.putInt(nFrames)
            b.putInt(bufSize); b.putInt(0); b.putInt(0)
            b.putShort(0); b.putShort(0)
            b.putShort(w.toShort); b.putShort(h.toShort)
            b.array()
          }
          val strf = {
            val b = java.nio.ByteBuffer.allocate(40).order(le)
            b.putInt(40); b.putInt(w); b.putInt(h)
            b.putShort(1); b.putShort(24)
            b.putInt(if (mjpg) MjpgFourcc else 0)
            b.putInt(bufSize)
            b.array()
          }
          val movi = (0 until nFrames).toArray.flatMap(f =>
            chunk(if (mjpg) "00dc" else "00db", frameBytes(f)))
          val body = "AVI ".getBytes("US-ASCII") ++
            list("hdrl", chunk("avih", avih) ++
              list("strl", chunk("strh", strh) ++ chunk("strf", strf))) ++
            list("movi", movi)
          val riff = java.nio.ByteBuffer.allocate(8 + body.length).order(le)
          riff.put("RIFF".getBytes("US-ASCII")); riff.putInt(body.length)
          riff.put(body)
          Row(r.getLong(0), riff.array())
        }
      }(encoder)
  }

  /** Frame sampling for video payloads: emit every `stride`-th fixed-size
    * window of the payload as a "frame" (stub for keyframe extraction —
    * the explode/fan-out shape and frame indexing are the real parts).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        greatest(lit(1), (col("meta.byte_len") / lit(frameBytes.toLong * stride)).cast("int")))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .select(
        col("media_id"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * frameBytes * stride + 1).cast("int"),
          lit(frameBytes)).as("frame_payload"))

  /** Wrap a text corpus as synthetic media rows (test/bench harness: the
    * bytes are the UTF-8 payload; deterministic, no external fixtures).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("media_type"),
        lit("raw").as("format"),
        length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
        (pmod(col("doc_id"), lit(100)) + 20).cast("int").as("width"),
        (pmod(col("doc_id"), lit(80)) + 20).cast("int").as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
}
