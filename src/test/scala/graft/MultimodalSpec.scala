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

  test("feature extraction: deterministic fixed-dim vectors via mapPartitions") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    assert(f1.select(size(col("features"))).distinct().as[Int].collect().toSeq == Seq(16))
    // deterministic across runs
    val a = f1.filter(col("media_id") === 7).select("features").as[Seq[Float]].head()
    val b = Multimodal.extractFeatures(media, dim = 16)
      .filter(col("media_id") === 7).select("features").as[Seq[Float]].head()
    assert(a == b)
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
}
