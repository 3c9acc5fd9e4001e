package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents"))

  test("media rows carry typed metadata matching the declared schema") {
    val got = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = media.select(col("meta.byte_len"), length(col("payload"))).as[(Long, Int)].head()
    assert(r._1 == r._2.toLong)
  }

  test("P12 media gate: small payloads / tiny dims dropped") {
    val kept = Multimodal.validMediaFilter(media, minBytes = 200, minDim = 50)
    val stats = kept.select(min(col("meta.byte_len")), min(col("meta.width"))).head()
    assert(stats.getLong(0) >= 200)
    assert(stats.getInt(1) >= 50)
    assert(kept.count() < media.count())
    assert(kept.count() > 0)
  }

  test("video feature seam: deterministic fixed-dim vectors via mapPartitions") {
    val video = media.withColumn("meta",
      col("meta").withField("media_type", lit("video")))
    val f1 = Multimodal.videoFeatureSeam(video, dim = 16)
    assert(f1.select(size(col("features"))).distinct().as[Int].collect().toSeq == Seq(16))
    // deterministic across runs
    val a = f1.filter(col("media_id") === 7).select("features").as[Seq[Float]].head()
    val b = Multimodal.videoFeatureSeam(video, dim = 16)
      .filter(col("media_id") === 7).select("features").as[Seq[Float]].head()
    assert(a == b)
  }

  test("video feature seam HARD-FAILS on decodable media (image/audio)") {
    // `media` rows carry media_type "image" — the fake featurizer must be
    // unreachable for them (real decoders exist), not silently wrong
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFeatureSeam(media, dim = 8).collect()
    }
    assert(ex.getMessage.contains("videoFeatureSeam") ||
      Option(ex.getCause).exists(_.getMessage.contains("videoFeatureSeam")))
  }

  test("frame sampling fans out indexed fixed-size frames") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val perDoc = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("mx")).collect()
    perDoc.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("mx") + 1)  // dense 0..n-1 indexing
    }
    val fl = frames.select(length(col("frame_payload"))).as[Int].collect()
    assert(fl.forall(_ <= 64))
    assert(fl.exists(_ == 64))
  }

  private def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    // REAL encoded bytes via javax.imageio — the parser under test never
    // sees these encoders, only the standard container formats
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics(); g.fillRect(0, 0, w, h); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt encoder")
    bos.toByteArray
  }

  test("ImageDims parses real PNG/JPEG/GIF headers byte-for-byte") {
    import graft.functions.ImageDims
    for ((fmt, w, h) <- Seq(("png", 123, 45), ("jpg", 300, 77), ("gif", 62, 50))) {
      val packed = ImageDims.parse(encode(w, h, fmt))
      assert(packed >= 0, s"$fmt did not parse")
      assert(((packed >> 28) & ((1L << 28) - 1)) == w, s"$fmt width")
      assert((packed & ((1L << 28) - 1)) == h, s"$fmt height")
    }
    // garbage, truncated, and empty payloads refuse to parse
    assert(ImageDims.parse("not an image".getBytes) == -1L)
    assert(ImageDims.parse(encode(40, 40, "png").take(12)) == -1L)
    assert(ImageDims.parse(Array.emptyByteArray) == -1L)
  }

  test("ImageDims parses BMP and all three WebP chunk layouts") {
    import graft.functions.ImageDims
    // BMP through the JDK's own encoder (round-trip like png/jpg/gif)
    val bmp = ImageDims.parse(encode(77, 31, "bmp"))
    assert(bmp >= 0 && (bmp >> 56) == ImageDims.FmtBmp)
    assert(((bmp >> 28) & 0xFFFFFFFL) == 77 && (bmp & 0xFFFFFFFL) == 31)
    // WebP has no JDK encoder: hand-build the three container layouts
    def riff(cc: String, payload: Array[Byte]): Array[Byte] = {
      val body = "WEBP".getBytes ++ cc.getBytes ++
        Array[Byte]((payload.length & 0xFF).toByte,
          ((payload.length >> 8) & 0xFF).toByte,
          ((payload.length >> 16) & 0xFF).toByte,
          ((payload.length >> 24) & 0xFF).toByte) ++ payload
      "RIFF".getBytes ++ Array[Byte]((body.length & 0xFF).toByte,
        ((body.length >> 8) & 0xFF).toByte, ((body.length >> 16) & 0xFF).toByte,
        ((body.length >> 24) & 0xFF).toByte) ++ body
    }
    // VP8 lossy: frame tag + 9D012A sync + 14-bit LE dims (240x181)
    val vp8 = riff("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
      240.toByte, 0, 181.toByte, 0, 0, 0))
    val p1 = ImageDims.parse(vp8)
    assert((p1 >> 56) == ImageDims.FmtWebp)
    assert(((p1 >> 28) & 0xFFFFFFFL) == 240 && (p1 & 0xFFFFFFFL) == 181)
    // VP8L lossless: 0x2F + (w-1 | (h-1)<<14) packed LE: 300x200
    val bits = (300 - 1) | ((200 - 1) << 14)
    val vp8l = riff("VP8L", Array[Byte](0x2F, (bits & 0xFF).toByte,
      ((bits >> 8) & 0xFF).toByte, ((bits >> 16) & 0xFF).toByte,
      ((bits >> 24) & 0xFF).toByte, 0, 0, 0, 0, 0))
    val p2 = ImageDims.parse(vp8l)
    assert(((p2 >> 28) & 0xFFFFFFFL) == 300 && (p2 & 0xFFFFFFFL) == 200)
    // VP8X extended: flags(4) + 24-bit LE (w-1, h-1): 1920x1080
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0,
      ((1920 - 1) & 0xFF).toByte, (((1920 - 1) >> 8) & 0xFF).toByte, 0,
      ((1080 - 1) & 0xFF).toByte, (((1080 - 1) >> 8) & 0xFF).toByte, 0))
    val p3 = ImageDims.parse(vp8x)
    assert(((p3 >> 28) & 0xFFFFFFFL) == 1920 && (p3 & 0xFFFFFFFL) == 1080)
    // formatOf surfaces the new tags
    val fmts = Seq(encode(60, 60, "bmp"), vp8).toDF("payload")
      .select(ImageDims.formatOf(ImageDims.expr(col("payload"))))
      .as[String].collect().toSet
    assert(fmts == Set("bmp", "webp"))
    // a bad VP8 sync code refuses to parse
    val broken = vp8.clone(); broken(23) = 0x00
    assert(ImageDims.parse(broken) == -1L)
  }

  test("P12 gate judges dims from the payload bytes, not metadata") {
    import org.apache.spark.sql.types._
    val lying = Seq(
      // row 1: real 80x80 png, metadata CLAIMS 10x10 → must survive
      (1L, encode(80, 80, "png"), 10, 10),
      // row 2: real 10x10 png, metadata CLAIMS 80x80 → must be dropped
      (2L, encode(10, 10, "png"), 80, 80),
      // row 3: non-image payload, metadata 80x80 → metadata fallback keeps it
      (3L, Array.fill[Byte](9000)(7), 80, 80))
    val df = lying.toDF("media_id", "payload", "w", "h")
      .select(col("media_id"), col("payload"),
        struct(lit("image").as("media_type"), lit("png").as("format"),
          length(col("payload")).cast("long").as("byte_len"),
          col("w").as("width"), col("h").as("height"),
          lit(null).cast(LongType).as("duration_ms")).as("meta"))
    val kept = Multimodal.validMediaFilter(df, minBytes = 100, minDim = 50)
      .select("media_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    // strict image gate: only the real, large-enough image stream survives
    val strict = Multimodal.validImageFilter(df, minBytes = 100, minDim = 50)
      .select("media_id").as[Long].collect().toSet
    assert(strict == Set(1L))
  }

  test("imageMeta exposes decoded format/width/height columns") {
    val rows = Seq(
      (1L, encode(33, 21, "jpg")),
      (2L, encode(5, 9, "gif")),
      (3L, "plain text".getBytes)).toDF("media_id", "payload")
    val got = Multimodal.imageMeta(rows)
      .select(col("media_id"), col("img_format"), col("img_width"), col("img_height"))
      .as[(Long, Option[String], Option[Int], Option[Int])].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("jpeg"), Some(33), Some(21))))
    assert(got(1) == ((2L, Some("gif"), Some(5), Some(9))))
    assert(got(2) == ((3L, None, None, None)))
  }

  test("decodeImages: real pixels — means, dims, JPEG tolerance, garbage nulls") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def solid(w: Int, h: Int, rgb: (Int, Int, Int), fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb._1, rgb._2, rgb._3))
      g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val rows = Seq(
      (1L, solid(20, 10, (200, 50, 25), "png")),
      (2L, solid(16, 16, (10, 240, 30), "jpg")),
      (3L, "not an image at all".getBytes))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeImages(rows).collect().map(r => r.getLong(0) -> r).toMap
    // lossless PNG: exact means + dims
    assert(got(1L).getInt(1) == 20 && got(1L).getInt(2) == 10)
    assert((got(1L).getInt(3), got(1L).getInt(4), got(1L).getInt(5)) == ((200, 50, 25)))
    // lossy JPEG: dims exact, means within codec tolerance
    assert(got(2L).getInt(1) == 16 && got(2L).getInt(2) == 16)
    assert(math.abs(got(2L).getInt(3) - 10) <= 8)
    assert(math.abs(got(2L).getInt(4) - 240) <= 8)
    // garbage: row kept, fields null
    assert(got(3L).isNullAt(1) && got(3L).isNullAt(6))
  }

  test("dHash: identical patterns match, near-identical close, different far") {
    def gradient(w: Int, h: Int, shift: Int, fmt: String = "png"): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = math.min(255, (x * 255 / w + shift).abs % 256)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    def inverse(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = 255 - (x * 255 / w)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val rows = Seq(
      (1L, gradient(90, 60, 0)),
      (2L, gradient(90, 60, 2)),    // tiny brightness shift: same structure
      (3L, inverse(90, 60)))        // reversed gradient: opposite structure
      .toDF("media_id", "payload")
    val sigs = Multimodal.decodeImages(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) <= 3)
    assert(ham(sigs(1L), sigs(3L)) >= 32)
    // banded hamming pairs: lossless blocking finds exactly the near pair
    val sigDf = sigs.toSeq.toDF("id", "sig")
    val pairs = graft.operators.Dedup.hammingNearDupPairs(
        sigDf, col("id"), col("sig"), maxDist = 3, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("decodeAudio: real PCM decode — JDK-encoded WAV, hand-rolled WAV, garbage") {
    // a WAV written by the JDK's OWN encoder (cross-checks our RIFF writer)
    val samples = Array.tabulate[Short](500)(i => ((i * 53) % 60000 - 30000).toShort)
    val bytes = {
      val data = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(data.putShort)
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data.array()), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // our own writer's output for the same formula as q98
    val ours = Multimodal.encodeWavs(Seq((7L, 100, 3)).toDF("id", "n", "k"))
      .select(col("id").as("media_id"), col("payload"))
    val rows = ours.unionByName(
      Seq((1L, bytes), (2L, "definitely not audio".getBytes))
        .toDF("media_id", "payload"))
    val got = Multimodal.decodeAudio(rows).collect().map(r => r.getLong(0) -> r).toMap
    val expSumSq = samples.map(s => s.toLong * s).sum
    assert(got(1L).getInt(1) == 16000 && got(1L).getInt(2) == 1)
    assert(got(1L).getLong(3) == 500L && got(1L).getLong(4) == expSumSq)
    // hand-rolled RIFF decodes identically: formula-exact sum of squares
    val exp7 = (0 until 100).map(i => (i.toLong * 3 * 37) % 65536 - 32768)
      .map(s => s * s).sum
    assert(got(7L).getInt(1) == 8000 && got(7L).getLong(3) == 100L)
    assert(got(7L).getLong(4) == exp7)
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(4))
  }

  test("audioFingerprint: energy-contour bits, gain invariance, short/garbage nulls") {
    // hand-built 16-bit mono WAV with CONTROLLED per-frame energies:
    // frame f (4 samples) holds constant amplitude amp(f)
    def wav(amps: Seq[Short]): Array[Byte] = {
      val data = java.nio.ByteBuffer.allocate(amps.length * 4 * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      amps.foreach(a => (1 to 4).foreach(_ => data.putShort(a)))
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data.array()), fmt, amps.length * 4L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val contour = Seq[Short](100, 200, 150, 400, 400) // up, down, up, flat
    val doubled = contour.map(a => (a * 2).toShort)   // uniform gain
    val rows = Seq(
      (1L, wav(contour)), (2L, wav(doubled)),
      (3L, wav(Seq(5))),                    // 1 frame -> null
      (4L, "not audio".getBytes)).toDF("media_id", "payload")
    val got = Multimodal.audioFingerprint(rows, frameSamples = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // bits: f0->f1 up (1), f1->f2 down (0), f2->f3 up (1), f3->f4 flat (0)
    assert(got(1L).getInt(1) == 5 && got(1L).getLong(2) == 5L) // 0b0101
    // uniform gain scales every energy by 4: identical contour signature
    assert(got(2L).getLong(2) == got(1L).getLong(2))
    assert(got(3L).isNullAt(1) && got(4L).isNullAt(2))
  }

  test("audioFingerprint feeds hammingNearDupPairs like the image dHash path") {
    // three sawtooth streams: 1 and 2 share k (identical PCM), 3 differs
    val wavs = Multimodal.encodeWavs(
        Seq((1L, 2048, 3), (2L, 2048, 3), (3L, 2048, 5)).toDF("id", "n", "k"))
      .select(col("id").as("media_id"), col("payload"))
    val fp = Multimodal.audioFingerprint(wavs, 256)
      .select(col("media_id").as("id"), col("fp").as("sig"))
    val pairs = graft.operators.Dedup.hammingNearDupPairs(
        fp, col("id"), col("sig"), maxDist = 3, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("decodeVideoMeta: MP4 box walk — mvhd duration, tkhd dims, garbage nulls") {
    val params = Seq((1L, 600, 90000L, 1920, 1080)).toDF("id", "timescale", "dur_units", "w", "h")
    val mp4 = Multimodal.encodeMp4s(params)
      .select(col("id").as("media_id"), col("payload"))
    val rows = mp4.unionByName(Seq((2L, "AVI maybe?".getBytes)).toDF("media_id", "payload"))
    val got = Multimodal.decodeVideoMeta(rows).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 90000L * 1000 / 600) // 150000 ms
    assert(got(1L).getInt(2) == 600)
    assert(got(1L).getInt(3) == 1920 && got(1L).getInt(4) == 1080)
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(3))
  }

  test("decodeVideoMeta: v1 (64-bit) mvhd/tkhd layouts read the widened offsets") {
    // hand-built version-1 full boxes: creation/modification/duration widen
    // to 64 bits, shifting tkhd width/height to body offsets 88/92. The
    // matrix's last entry (0x40000000, body offset 84) sits exactly where a
    // v0-plus-8 misread would look — a wrong offset reads 16384×640 here.
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length); b.put(typ.getBytes("US-ASCII")); b.put(payload)
      b.array()
    }
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(1.toByte); b.position(4)       // version=1, flags=0
      b.putLong(11L); b.putLong(22L)       // creation/modification (64-bit)
      b.putInt(1000)                       // timescale
      b.putLong(123456L)                   // duration (64-bit)
      b.array()
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(96)
      b.put(1.toByte); b.position(4)       // version=1, flags=0
      b.putLong(11L); b.putLong(22L)       // creation/modification (64-bit)
      b.putInt(1); b.putInt(0)             // track_ID, reserved
      b.putLong(123456L)                   // duration (64-bit) → offset 36
      b.position(52)                       // reserved[8]+layer+group+vol+res
      b.putInt(0x00010000); b.putInt(0); b.putInt(0)
      b.putInt(0); b.putInt(0x00010000); b.putInt(0)
      b.putInt(0); b.putInt(0); b.putInt(0x40000000) // matrix[8] @ offset 84
      b.putInt(640 << 16); b.putInt(360 << 16)       // width/height @ 88/92
      b.array()
    }
    val payload = box("ftyp", "isom   isom".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    val rows = Seq((9L, payload)).toDF("media_id", "payload")
    val got = Multimodal.decodeVideoMeta(rows).head()
    assert(got.getLong(1) == 123456L)      // 123456 units / 1000 → exact ms
    assert(got.getInt(2) == 1000)
    assert(got.getInt(3) == 640 && got.getInt(4) == 360)
  }

  test("validImageFilter gates bytes on the actual payload, not carried meta") {
    import org.apache.spark.sql.types._
    // payload is a REAL large-enough image but meta.byte_len lies small —
    // the strict gate must judge len(payload) (reference checks len(blob))
    val df = Seq((1L, encode(80, 80, "png")))
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("image").as("media_type"), lit("png").as("format"),
          lit(3L).as("byte_len"),           // lying: claims 3 bytes
          lit(80).as("width"), lit(80).as("height"),
          lit(null).cast(LongType).as("duration_ms")).as("meta"))
    val kept = Multimodal.validImageFilter(df, minBytes = 100, minDim = 50)
    assert(kept.count() == 1)
    // and a caller-owned __img_dims column survives both filters intact
    // (both variants now gate bytes on length(payload); the byte_len
    // rewrite below is irrelevant to the gate and kept only so the
    // fixture stays honest for the column-survival check)
    val df2 = df.withColumn("__img_dims", lit("mine"))
    assert(Multimodal.validImageFilter(df2, 100, 50)
      .select("__img_dims").head().getString(0) == "mine")
    val honest = df2.withColumn("meta",
      col("meta").withField("byte_len", length(col("payload")).cast("long")))
    assert(Multimodal.validMediaFilter(honest, 100, 50)
      .select("__img_dims").head().getString(0) == "mine")
  }

  test("decodeMp3Meta: frame walk — ID3 skip, CBR duration, truncation, 2.5") {
    // id 1 MPEG1 L3 128 kbps (idx 9) 44100 Hz (idx 0), 10 frames, 57-byte
    // ID3 tag → frame = 144·128000/44100 = 417 B; id 2 MPEG2 8 kbps (idx 1)
    // 16 kHz (idx 2), 8 frames, no tag → frame = 72·8000/16000 = 36 B
    val params = Seq((1L, 1, 10, 9, 0, 57), (2L, 2, 8, 1, 2, 0))
      .toDF("id", "v", "n_frames", "br_idx", "sr_idx", "id3_len")
    val payloads = Multimodal.encodeMp3s(params).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // MPEG2.5 header is hand-built (encoder scope is v1/v2): 8 kHz, 8 kbps
    // → frame = 72*8000/8000 = 72 B; verBits 00 → byte1 = 0xE3
    val v25 = {
      val frame = Array.fill[Byte](72)(0x11)
      frame(0) = 0xFF.toByte; frame(1) = 0xE3.toByte
      frame(2) = ((1 << 4) | (2 << 2)).toByte; frame(3) = 0xC0.toByte
      frame ++ frame.clone
    }
    val rows = (payloads.toSeq ++ Seq(
        3L -> v25,
        4L -> payloads(1L).dropRight(5),            // truncated final frame
        5L -> "not audio at all, sorry".getBytes))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeMp3Meta(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    // id 1: MPEG1 128 kbps 44100 Hz, 10 frames × 1152 samples
    assert(got(1L).getString(1) == "1" && got(1L).getInt(3) == 128)
    assert(got(1L).getInt(4) == 44100 && got(1L).getLong(5) == 10L)
    assert(got(1L).getLong(7) == 10L * 1152 * 1000 / 44100)
    // id 2: MPEG2 8 kbps 16 kHz, 8 frames × 576 samples
    assert(got(2L).getString(1) == "2" && got(2L).getInt(3) == 8)
    assert(got(2L).getInt(4) == 16000 && got(2L).getLong(6) == 8L * 576)
    // id 3: MPEG2.5 walk — two 72-byte frames at 8 kHz
    assert(got(3L).getString(1) == "2.5" && got(3L).getInt(4) == 8000)
    assert(got(3L).getLong(5) == 2L)
    // id 4: truncated last frame is not counted (10-frame stream minus
    // 5 bytes → 9 complete frames)
    assert(got(4L).getLong(5) == 9L)
    // id 5: garbage → row kept, fields null
    assert(got(5L).isNullAt(1) && got(5L).isNullAt(7))
  }

  test("decodeAdtsMeta: ADTS walk — VBR frame lengths, MPEG-2/4, truncation") {
    // id 1: MPEG-4 (id 0) LC (profile 1) 48 kHz (idx 3) stereo, 10 frames,
    // base 100 B; id 2: MPEG-2 (id 1) Main (profile 0) 8 kHz (idx 11)
    // 6 channels, 4 frames, base 200 B
    val params = Seq((1L, 0, 1, 3, 2, 10, 100), (2L, 1, 0, 11, 6, 4, 200))
      .toDF("id", "mpeg_id", "profile", "sr_idx", "channels", "n_frames", "base_len")
    val payloads = Multimodal.encodeAdts(params).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rows = (payloads.toSeq ++ Seq(
        3L -> payloads(1L).dropRight(3),            // truncated final frame
        4L -> "definitely not adts".getBytes))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeAdtsMeta(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    // id 1: MPEG-4 AAC-LC 48 kHz stereo, 10 frames x 1024 samples; the
    // VBR walk must consume every header (frame lens 100..154)
    assert(got(1L).getString(1) == "4" && got(1L).getInt(2) == 2)
    assert(got(1L).getInt(3) == 48000 && got(1L).getInt(4) == 2)
    assert(got(1L).getLong(5) == 10L && got(1L).getLong(6) == 10240L)
    assert(got(1L).getLong(7) == 10240L * 1000 / 48000)
    // id 2: MPEG-2 Main 8 kHz, 6-channel config survives the 3-bit split
    assert(got(2L).getString(1) == "2" && got(2L).getInt(2) == 1)
    assert(got(2L).getInt(3) == 8000 && got(2L).getInt(4) == 6)
    assert(got(2L).getLong(5) == 4L)
    // id 3: truncated last frame is not counted (10-frame stream minus
    // 3 bytes -> 9 complete frames)
    assert(got(3L).getLong(5) == 9L)
    // id 4: garbage -> row kept, fields null
    assert(got(4L).isNullAt(1) && got(4L).isNullAt(7))
  }

  test("decodeVideoFrames: AVI DIB walk — pixels, fps, sampling, top-down") {
    // 2 videos: id 1 = 16x12, 6 frames @ 10 fps from (10,20,30); id 2 =
    // 17x9 (odd width -> padded rows), 4 frames @ 25 fps from (200,100,50)
    val params = Seq((1L, 16, 12, 6, 10, 10, 20, 30), (2L, 17, 9, 4, 25, 200, 100, 50))
      .toDF("id", "w", "h", "n_frames", "fps", "r0", "g0", "b0")
    val payloads = Multimodal.encodeAvis(params).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Multimodal.decodeVideoFrames(
        payloads.toSeq.toDF("media_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getInt(5)) -> r).toMap
    assert(got.size == 10) // 6 + 4 frames at stride 1
    val f13 = got((1L, 3))
    assert(f13.getString(1) == "avi-dib")
    assert(f13.getLong(2) == 6L && f13.getInt(3) == 10)
    assert(f13.getLong(4) == 600L) // 6 frames / 10 fps
    assert(f13.getInt(6) == 16 && f13.getInt(7) == 12)
    assert(f13.getInt(8) == 10 + 33 && f13.getInt(9) == 20 + 15 && f13.getInt(10) == 30 + 9)
    assert(f13.getLong(11) == 0L) // solid frame -> empty dHash
    val f22 = got((2L, 2))
    assert(f22.getInt(6) == 17 && f22.getInt(8) == (200 + 22) % 256)
    // stride 2 keeps only even frame indices
    val sampled = Multimodal.decodeVideoFrames(
        payloads.toSeq.toDF("media_id", "payload"), frameStride = 2)
      .select("media_id", "frame_idx").as[(Long, Int)].collect().toSet
    assert(sampled == Set((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 2)))
    // top-down DIB: flip biHeight's sign (strf body starts at byte 172,
    // biHeight at 180); solid frames are row-symmetric so stats match
    val flipped = payloads(1L).clone()
    val hNeg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-12).array()
    System.arraycopy(hNeg, 0, flipped, 180, 4)
    val td = Multimodal.decodeVideoFrames(Seq((1L, flipped)).toDF("media_id", "payload"))
      .filter(col("frame_idx") === 3).head()
    assert(td.getInt(7) == 12 && td.getInt(8) == 43)
  }

  test("decodeVideoFrames: AVI MJPEG — every frame a real JPEG via imageio") {
    val params = Seq((7L, 32, 24, 3, 5, 120, 60, 180, 1))
      .toDF("id", "w", "h", "n_frames", "fps", "r0", "g0", "b0", "codec")
    val payload = Multimodal.encodeAvis(params).head().getAs[Array[Byte]](1)
    val got = Multimodal.decodeVideoFrames(Seq((7L, payload)).toDF("media_id", "payload"))
      .orderBy("frame_idx").collect()
    assert(got.length == 3)
    assert(got.forall(_.getString(1) == "avi-mjpg"))
    assert(got(0).getLong(2) == 3L && got(0).getInt(3) == 5)
    assert(got(0).getInt(6) == 32 && got(0).getInt(7) == 24)
    // JPEG is lossy: solid fills decode within a small tolerance
    for ((r, f) <- got.zipWithIndex) {
      assert(math.abs(r.getInt(8) - (120 + 11 * f)) <= 3)
      assert(math.abs(r.getInt(9) - (60 + 5 * f)) <= 3)
      assert(math.abs(r.getInt(10) - (180 + 3 * f)) <= 3)
    }
  }

  test("decodeVideoFrames: multi-frame GIF via imageio sequence") {
    def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (c <- Seq(0x102030, 0x405060, 0x708090))
      writer.writeToSequence(new javax.imageio.IIOImage(solid(20, 10, c), null, null), null)
    writer.endWriteSequence(); ios.close()
    val got = Multimodal.decodeVideoFrames(
        Seq((9L, bos.toByteArray)).toDF("media_id", "payload"), frameStride = 2)
      .orderBy("frame_idx").collect()
    assert(got.length == 2) // frames 0 and 2 of 3
    assert(got.forall(_.getString(1) == "gif"))
    assert(got(0).getLong(2) == 3L)
    assert(got(0).isNullAt(3) && got(0).isNullAt(4)) // no container-level fps
    assert((got(0).getInt(8), got(0).getInt(9), got(0).getInt(10)) == ((0x10, 0x20, 0x30)))
    assert((got(1).getInt(8), got(1).getInt(9), got(1).getInt(10)) == ((0x70, 0x80, 0x90)))
  }

  test("decodeVideoFrames: gif dHash agrees with decodeImages on the same bytes") {
    // gradient image -> nonzero dHash; the video path and the image path
    // must produce the IDENTICAL signature (shared grid arithmetic)
    val img = new java.awt.image.BufferedImage(40, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40)
      img.setRGB(x, y, ((x * 6) << 16) | ((y * 8) << 8) | ((x + y) & 0xFF))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val bytes = bos.toByteArray
    val viaVideo = Multimodal.decodeVideoFrames(
      Seq((1L, bytes)).toDF("media_id", "payload")).head()
    val viaImage = Multimodal.decodeImages(
      Seq((1L, bytes)).toDF("media_id", "payload")).head()
    assert(!viaVideo.isNullAt(11) && viaVideo.getLong(11) != 0L)
    assert(viaVideo.getLong(11) == viaImage.getLong(6))
  }

  test("decodeVideoFrames: truncation keeps leading frames; garbage -> null row") {
    val params = Seq((1L, 16, 12, 6, 10, 10, 20, 30))
      .toDF("id", "w", "h", "n_frames", "fps", "r0", "g0", "b0")
    val full = Multimodal.encodeAvis(params).head().getAs[Array[Byte]](1)
    val rows = Seq(
        (1L, full.dropRight(5)),                    // truncated mid-frame
        (2L, "not a container".getBytes))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeVideoFrames(rows).collect()
      .groupBy(_.getLong(0))
    assert(got(1L).map(_.getInt(5)).sorted.toSeq == Seq(0, 1, 2, 3, 4))
    assert(got(1L).forall(_.getLong(2) == 5L)) // 5 complete frames counted
    assert(got(2L).length == 1 && got(2L).head.isNullAt(1))
  }

  test("video feature seam HARD-FAILS on frame-decodable containers (AVI/GIF)") {
    val params = Seq((1L, 16, 12, 2, 10, 0, 0, 0))
      .toDF("id", "w", "h", "n_frames", "fps", "r0", "g0", "b0")
    val avi = Multimodal.encodeAvis(params).head().getAs[Array[Byte]](1)
    val media = Seq((1L, avi)).toDF("media_id", "payload")
      .withColumn("meta", struct(
        lit("video").as("media_type"), lit("avi").as("format"),
        length(col("payload")).cast("long").as("byte_len"),
        lit(null).cast(org.apache.spark.sql.types.IntegerType).as("width"),
        lit(null).cast(org.apache.spark.sql.types.IntegerType).as("height"),
        lit(null).cast(org.apache.spark.sql.types.LongType).as("duration_ms")))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFeatureSeam(media, dim = 8).collect()
    }
    assert(ex.getMessage.contains("decodeVideoFrames") ||
      Option(ex.getCause).exists(_.getMessage.contains("decodeVideoFrames")))
  }

  test("decodeFlacMeta: STREAMINFO unpack, padding-block chain walk, garbage") {
    import graft.multimodal.AudioContainers
    // id 1: 44.1 kHz stereo 16-bit, 441000 samples (10 s), no padding;
    // id 2: 8 kHz mono 24-bit, 12345 samples, PADDING block interposed
    val params = Seq((1L, 44100, 2, 16, 441000L, 0), (2L, 8000, 1, 24, 12345L, 99))
      .toDF("id", "sample_rate", "channels", "bits", "total_samples", "pad_len")
    val payloads = AudioContainers.encodeFlacs(params).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rows = (payloads.toSeq ++ Seq(
        3L -> payloads(1L).take(20),               // truncated STREAMINFO
        4L -> "not flac at all today".getBytes))
      .toDF("media_id", "payload")
    val got = AudioContainers.decodeFlacMeta(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) == 44100 && got(1L).getInt(2) == 2)
    assert(got(1L).getInt(3) == 16 && got(1L).getLong(4) == 441000L)
    assert(got(1L).getLong(5) == 10000L)
    assert(got(2L).getInt(1) == 8000 && got(2L).getInt(2) == 1)
    assert(got(2L).getInt(3) == 24 && got(2L).getLong(5) == 12345L * 1000 / 8000)
    assert(got(3L).isNullAt(1))
    assert(got(4L).isNullAt(1))
  }

  test("decodeOggMeta: page-chain walk, BOS id header, EOS granule, truncation") {
    import graft.multimodal.AudioContainers
    val params = Seq((1L, 48000, 2, 480000L, 5), (2L, 8000, 1, 8000L, 1))
      .toDF("id", "sample_rate", "channels", "total_samples", "n_pages")
    val payloads = AudioContainers.encodeOggs(params).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rows = (payloads.toSeq ++ Seq(
        3L -> payloads(1L).dropRight(10),          // truncated final page
        4L -> "oggs? not really a page".getBytes))
      .toDF("media_id", "payload")
    val got = AudioContainers.decodeOggMeta(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    // id 1: 6 pages (BOS + 5), last granule = total, duration 10 s
    assert(got(1L).getInt(1) == 2 && got(1L).getInt(2) == 48000)
    assert(got(1L).getLong(3) == 480000L && got(1L).getLong(4) == 6L)
    assert(got(1L).getLong(5) == 10000L)
    assert(got(2L).getLong(4) == 2L && got(2L).getLong(5) == 1000L)
    // id 3 truncates id 1's final page: the walk keeps the complete
    // leading pages — granule from audio page 4 of 5 (480000*4/5), page
    // count one short (BOS + 4)
    assert(got(3L).getLong(4) == 5L && got(3L).getLong(3) == 384000L)
    assert(got(3L).getLong(5) == 8000L)
    assert(got(4L).isNullAt(1))
  }

  test("Compressed: codec sniff + round trip, corrupt payloads, bomb cap") {
    import graft.sources.Compressed
    val texts = Seq(
      (0L, "plain ascii content here", 0),
      (1L, "托育机构备案信息 — 中文 text through zstd", 1),
      (2L, "deflate stream with no gzip wrapper", 2),
      (3L, "bzip2 via commons-compress", 3))
      .toDF("id", "text", "codec")
    val payloads = Compressed.compressText(texts).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val corrupt = payloads(0L).clone()
    corrupt(corrupt.length - 3) = (corrupt(corrupt.length - 3) ^ 0x55).toByte
    val rows = (payloads.toSeq ++ Seq(
        4L -> corrupt,                              // valid magic, bad body
        5L -> "no compression at all".getBytes))
      .toDF("media_id", "payload")
    val got = Compressed.decompressText(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getString(1) == "gzip" &&
      got(0L).getString(2) == "plain ascii content here")
    assert(got(1L).getString(1) == "zstd" && got(1L).getString(2).contains("中文"))
    assert(got(2L).getString(1) == "zlib" && got(2L).getString(2).startsWith("deflate"))
    assert(got(3L).getString(1) == "bzip2" && got(3L).getString(2).endsWith("compress"))
    // corrupt body: codec sniffed, text null, row kept
    assert(got(4L).getString(1) == "gzip" && got(4L).isNullAt(2))
    assert(got(5L).isNullAt(1) && got(5L).isNullAt(2))
    // zip-bomb guard: 1 MB of zeros compresses to ~1 KB; a 4 KB inflate
    // cap must reject it as over-cap rather than materialize it
    val bomb = Compressed.compressText(
      Seq((9L, "0" * 1048576, 0)).toDF("id", "text", "codec"))
      .select(col("id").as("media_id"), col("payload"))
    val capped = Compressed.decompressText(bomb, maxBytes = 4096).head()
    assert(capped.getString(1) == "gzip" && capped.isNullAt(2))
  }

  test("decodeId3Tags: v2.3 plain vs v2.4 syncsafe sizes, encodings, terminators") {
    import graft.multimodal.AudioContainers
    // id 1: v2.3 with a >127-byte UTF-8 title — reading its plain 32-bit
    // size as syncsafe would desync the walk and lose TPE1/TALB
    val longTitle = "T" * 150
    val params = Seq(
      (1L, longTitle, "Art A", "Alb A", 3, 3),
      (2L, "Unicode 标题", "艺术家", "专辑", 4, 1),   // v2.4, UTF-16 BOM
      (3L, "Latin title", "Artist B", "Album B", 4, 0))
      .toDF("id", "title", "artist", "album", "v", "enc")
    val payloads = AudioContainers.encodeId3s(params).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // hand-append a double-null terminator to a UTF-16 frame: rebuild id 2
    // with text "A" (UTF-16LE "A" = 41 00 — a naive trailing-zero strip
    // would eat the character's high byte)
    val rows = (payloads.toSeq ++ Seq(4L -> "no tag here".getBytes))
      .toDF("media_id", "payload")
    val got = AudioContainers.decodeId3Tags(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "2.3" && got(1L).getString(2) == longTitle)
    assert(got(1L).getString(3) == "Art A" && got(1L).getString(4) == "Alb A")
    assert(got(2L).getString(1) == "2.4" && got(2L).getString(2) == "Unicode 标题")
    assert(got(2L).getString(3) == "艺术家" && got(2L).getString(4) == "专辑")
    assert(got(3L).getString(2) == "Latin title")
    assert(got(4L).isNullAt(1) && got(4L).isNullAt(2))
    // UTF-16 text whose final char's high byte is 0x00 survives intact
    val single = AudioContainers.encodeId3s(
      Seq((5L, "A", "B", "C", 4, 1)).toDF("id", "title", "artist", "album", "v", "enc"))
      .select(col("id").as("media_id"), col("payload"))
    val r5 = AudioContainers.decodeId3Tags(single).head()
    assert(r5.getString(2) == "A" && r5.getString(3) == "B")
  }

  test("binaryFile ingestion path (S5 entry point)") {
    val dir = java.nio.file.Files.createTempDirectory("media").toFile
    val f = new java.io.File(dir, "sample.png")
    java.nio.file.Files.write(f.toPath, Array.fill[Byte](600)(7))
    val got = Multimodal.readBinaryDir(spark, dir.toString, "image")
    val row = got.select(col("meta.format"), col("meta.byte_len"), col("meta.media_type")).head()
    assert(row.getString(0) == "png")
    assert(row.getLong(1) == 600L)
    assert(row.getString(2) == "image")
  }

  test("decodeFlacMeta: oddly-ordered metadata chain (comment + padding BEFORE streaminfo)") {
    import graft.multimodal.AudioContainers
    // hand-built: fLaC magic, then VORBIS_COMMENT (type 4) and PADDING
    // (type 1) blocks FIRST, STREAMINFO (type 0) last-flagged at the end —
    // legal per spec ordering tools rarely emit; the walk must reach it
    def block(typ: Int, last: Boolean, body: Array[Byte]): Array[Byte] =
      Array((typ | (if (last) 0x80 else 0)).toByte,
        ((body.length >> 16) & 0xFF).toByte, ((body.length >> 8) & 0xFF).toByte,
        (body.length & 0xFF).toByte) ++ body
    val sr = 22050; val ch = 1; val bits = 16; val total = 44100L
    val si = new Array[Byte](34)
    val packed = (sr.toLong << 44) | ((ch - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | total
    java.nio.ByteBuffer.wrap(si, 10, 8).putLong(packed)
    val payload = "fLaC".getBytes("US-ASCII") ++
      block(4, last = false, "comment-block-bytes-here".getBytes) ++
      block(1, last = false, new Array[Byte](64)) ++
      block(0, last = true, si)
    val got = AudioContainers.decodeFlacMeta(
      Seq((7L, payload)).toDF("media_id", "payload")).collect().head
    assert(got.getInt(1) == 22050 && got.getInt(2) == 1 && got.getInt(3) == 16)
    assert(got.getLong(4) == 44100L && got.getLong(5) == 2000L)
  }

  test("decodeOggMeta: continued pages (granule -1) never clobber the real position") {
    import graft.multimodal.AudioContainers
    def le32b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le64b(v: Long) = le32b(v.toInt) ++ le32b((v >> 32).toInt)
    def page(granule: Long, headerType: Int, seq: Int, body: Array[Byte]): Array[Byte] = {
      val lacing = (Array.fill(body.length / 255)(255) :+ (body.length % 255)).map(_.toByte)
      "OggS".getBytes("US-ASCII") ++ Array[Byte](0, headerType.toByte) ++
        le64b(granule) ++ le32b(1) ++ le32b(seq) ++ le32b(0) ++
        Array(lacing.length.toByte) ++ lacing ++ body
    }
    val idHeader = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      new Array[Byte](4) ++ Array[Byte](2) ++ le32b(16000) ++ new Array[Byte](8)
    // BOS id page, one audio page ending a packet (granule 32000), then a
    // CONTINUED page on which no packet completes (granule -1, EOS set)
    val payload = page(0L, 0x02, 0, idHeader) ++
      page(32000L, 0x00, 1, new Array[Byte](300)) ++
      page(-1L, 0x05, 2, new Array[Byte](40))
    val got = AudioContainers.decodeOggMeta(
      Seq((9L, payload)).toDF("media_id", "payload")).collect().head
    assert(got.getInt(1) == 2 && got.getInt(2) == 16000)
    assert(got.getLong(3) == 32000L, "granule -1 must not be taken as the stream position")
    assert(got.getLong(4) == 3L)
    assert(got.getLong(5) == 2000L)
  }

  test("ImageDims: TIFF IFD0 in both byte orders, SHORT and LONG dim types") {
    import graft.functions.ImageDims
    def leTiff(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + 2 + 24 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      b.putShort(2)
      b.putShort(256).putShort(3).putInt(1).putShort(w.toShort).putShort(0)
      b.putShort(257).putShort(4).putInt(1).putInt(h)
      b.putInt(0)
      b.array()
    }
    def beTiff(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + 2 + 24 + 4)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
      b.putShort(2)
      // SHORT value left-justified in the 4-byte field (TIFF 6.0)
      b.putShort(256).putShort(3).putInt(1).putShort(w.toShort).putShort(0)
      b.putShort(257).putShort(4).putInt(1).putInt(h)
      b.putInt(0)
      b.array()
    }
    def unpack(p: Long) = (p >> 56, (p >> 28) & ((1L << 28) - 1), p & ((1L << 28) - 1))
    assert(unpack(ImageDims.parse(leTiff(640, 480))) == ((ImageDims.FmtTiff, 640L, 480L)))
    assert(unpack(ImageDims.parse(beTiff(123, 77))) == ((ImageDims.FmtTiff, 123L, 77L)))
    // truncated IFD and missing dims parse to -1, never throw
    assert(ImageDims.parse(leTiff(640, 480).take(9)) == -1L)
    assert(ImageDims.parse("II*\u0000garbage".getBytes("ISO-8859-1")) == -1L)
    // count != 1: the value field is a file OFFSET, not the dim — reject
    val badCount = leTiff(640, 480)
    badCount(8 + 2 + 4) = 2 // ImageWidth entry count LE32 -> 2
    assert(ImageDims.parse(badCount) == -1L)
    // real imageio TIFF round trip through the fixture encoder (f = 3)
    val enc = Multimodal.encodeImages(
      Seq((1L, 3, 33, 21)).toDF("id", "f", "w", "h")).collect().head
    val packed = ImageDims.parse(enc.getAs[Array[Byte]](1))
    assert(unpack(packed) == ((ImageDims.FmtTiff, 33L, 21L)))
  }

  test("decodeId3Tags: v2.2 three-char frames with 3-byte sizes (old-rip format)") {
    import graft.multimodal.AudioContainers
    def frame22(fid: String, text: String, enc: Int): Array[Byte] = {
      val payload = Array(enc.toByte) ++ (if (enc == 1)
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")
      else text.getBytes("ISO-8859-1"))
      fid.getBytes("US-ASCII") ++
        Array[Byte](((payload.length >> 16) & 0xFF).toByte,
          ((payload.length >> 8) & 0xFF).toByte, (payload.length & 0xFF).toByte) ++
        payload
    }
    val frames = frame22("TT2", "Old Title", 0) ++
      frame22("TP1", "老艺术家", 1) ++ frame22("TAL", "Album 95", 0)
    val tag = "ID3".getBytes ++ Array[Byte](2, 0, 0) ++
      Array[Byte](((frames.length >> 21) & 0x7F).toByte,
        ((frames.length >> 14) & 0x7F).toByte,
        ((frames.length >> 7) & 0x7F).toByte, (frames.length & 0x7F).toByte) ++
      frames ++ Array.fill[Byte](16)(0) // zero padding after the frames
    val got = AudioContainers.decodeId3Tags(
      Seq((1L, tag ++ "audio".getBytes)).toDF("media_id", "payload")).head()
    assert(got.getString(1) == "2.2")
    assert(got.getString(2) == "Old Title")
    assert(got.getString(3) == "老艺术家")
    assert(got.getString(4) == "Album 95")
  }

  test("decodeId3Tags: hostile 0x7FFFFFFF frame size yields nulls, not a crash") {
    import graft.multimodal.AudioContainers
    val tag = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 40) ++
      "TIT2".getBytes ++ Array[Byte](0x7F, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        0, 0) ++ Array.fill[Byte](30)(1)
    val got = AudioContainers.decodeId3Tags(
      Seq((1L, tag)).toDF("media_id", "payload")).head()
    assert(got.isNullAt(2) && got.isNullAt(3) && got.isNullAt(4))
  }
}
