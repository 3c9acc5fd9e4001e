package graft

import graft.functions.TextFunctions
import graft.sources.Csv
import graft.streaming.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CsvSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("CSV dialect sniffing picks the real delimiter") {
    assert(Csv.sniffDelimiter("a,b,c") == ',')
    assert(Csv.sniffDelimiter("a;b;c;d") == ';')
    assert(Csv.sniffDelimiter("a\tb\tc") == '\t')
    assert(Csv.sniffDelimiter("a|b|c|d|e") == '|')
  }

  test("CSV scan: sniffed read, 500-row cap with truncation marker (O5)") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toFile
    val f = new java.io.File(dir, "t.csv")
    val rows = (1 to 600).map(i => s"$i;name_$i;${i * 2}")
    java.nio.file.Files.write(f.toPath,
      (Seq("id;name;v") ++ rows).mkString("\n").getBytes("UTF-8"))
    val got = Csv.read(spark, f.toString, cap = 500)
    assert(got.count() == 501)
    assert(got.columns.toSeq == Seq("id", "name", "v"))
    val marker = got.filter(col("id").startsWith("...")).collect()
    assert(marker.length == 1)
    assert(marker.head.getString(0).contains("truncated to 500"))

    // under the cap: no marker
    val small = new java.io.File(dir, "small.csv")
    java.nio.file.Files.write(small.toPath, "a,b\n1,2\n3,4".getBytes("UTF-8"))
    assert(Csv.read(spark, small.toString, cap = 500).count() == 2)
  }

  test("CSV scan: distributed path above DriverCapMax matches the driver path") {
    val dir = java.nio.file.Files.createTempDirectory("csvdist").toFile
    val f = new java.io.File(dir, "t.csv")
    val rows = (1 to 800).map(i => s"$i;name_$i;${i * 2}")
    java.nio.file.Files.write(f.toPath,
      (Seq("id;name;v") ++ rows).mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.IntegerType)))
    // truncating: cap 600 > DriverCapMax → distributed limit + marker
    val got = Csv.read(spark, f.toString, cap = 600, schema = Some(schema))
    assert(got.count() == 601)
    val marker = got.filter(col("id").startsWith("...")).collect()
    assert(marker.length == 1 && marker.head.getString(0).contains("truncated to 600"))
    // kept rows are the FIRST 600 in file order
    assert(got.filter(!col("id").startsWith("...")).agg(max(col("id").cast("int")))
      .head().getInt(0) == 600)
    // non-truncating: cap above row count → all rows, no marker, typed cols
    val all = Csv.read(spark, f.toString, cap = 10000, schema = Some(schema))
    assert(all.count() == 800)
    assert(all.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
  }

  test("F14 decode chain: UTF-8 first, GBK fallback, round-trip validated") {
    val s = "托育机构名称"
    val utf8 = s.getBytes("UTF-8")
    val gbk = s.getBytes("GBK")
    val df = Seq(("utf8", utf8), ("gbk", gbk)).toDF("tag", "bin")
    val got = df.select(col("tag"), TextFunctions.decodeChain(col("bin")).as("t"))
      .as[(String, String)].collect().toMap
    assert(got("utf8") == s)
    assert(got("gbk") == s)
  }

  test("S16 KB sink: partition-batched pushes through the client seam") {
    // closures are serialized even in local mode — record via accumulator
    val acc = spark.sparkContext.collectionAccumulator[Int]("kb_batches")
    class RecordingClient extends Sinks.KbClient {
      def createByText(batch: Seq[(String, String)]): Seq[String] = {
        acc.add(batch.size)
        batch.map(_._1)
      }
    }
    val docs = (1 to 37).map(i => (s"doc$i", s"# content $i")).toDF("name", "md")
      .repartition(2)
    Sinks.writeToKb(docs, "name", "md", new RecordingClient, batchSize = 10)
    val sizes = acc.value.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.sum == 37)
    assert(sizes.forall(_ <= 10))
  }

  test("S16 KB requests: the reference's documented create_by_text model") {
    val docs = Seq(
      ("未来之星托育中心", "# 机构简介\n\"quoted\" & newline"),
      ("plain", "body")).toDF("name", "md")
    val got = Sinks.kbRequests(docs, col("name"), col("md"), datasetId = "ds1",
        endpoint = "http://host.docker.internal")
      .collect().map(r => r.getString(2) -> r).toMap
    val r = got("未来之星托育中心")
    assert(r.getString(0) == "http://host.docker.internal/v1/datasets/ds1/document/create_by_text")
    assert(r.getString(1) == "POST")
    assert(r.getString(4) == "high_quality" && r.getString(5) == "automatic")
    // the serialized body is exactly what the client must POST: compact
    // JSON, documented field order, JSON-escaped content
    assert(r.getString(6) ==
      """{"name":"未来之星托育中心","text":"# 机构简介\n\"quoted\" & newline",""" +
        """"indexing_technique":"high_quality","process_rule":{"mode":"automatic"}}""")
  }
}
