package graft

import graft.operators.{Dedup, Export, Sampling, Similarity}
import graft.sources.Archives
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: tar-shard export (webdataset shape), soft-dedup
  * down-weighting, cluster-balanced diversity sampling.
  */
class ExportShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(leaf: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$leaf")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("writeTarShards: members round-trip byte-exactly in (okey, id) order") {
    val docs = (1L to 200L).map(i => (i, s"doc $i body — π∞")).toDF("id", "body")
    val out = tmpDir("tarshards")
    Export.writeTarShards(docs, col("id"),
      format_string("%012d.txt", col("id")), col("body"),
      nShards = 4, outDir = out)

    // exactly one tar per non-empty shard, named by shard value
    val files = new java.io.File(out).listFiles.map(_.getName).sorted
    assert(files.forall(_.matches("shard-\\d{5}\\.tar")))

    val back = Archives.parseTar(
      spark.read.format("binaryFile").load(s"$out/shard-*.tar")
        .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1)
          .cast("long").as("file_id"), col("content").as("payload")))
      .select(col("file_id").as("shard"), col("member_idx"),
        regexp_extract(col("name"), "(\\d+)\\.txt", 1).cast("long").as("id"),
        col("text"))
      .collect()

    assert(back.length == 200)
    // payloads round-trip (incl. non-ASCII)
    back.foreach { r =>
      assert(r.getString(3) == s"doc ${r.getLong(2)} body — π∞")
    }
    // member order inside each tar == the deterministic (okey, id) order,
    // and shard == hashBucket(id, 4)
    val expected = docs
      .withColumn("shard", Sampling.hashBucket(col("id"), 4))
      .withColumn("okey", Sampling.hashBucket(col("id"), 1 << 30, 1))
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(0)))
      .groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.sortBy(t => (t._2, t._3)).map(_._3).toSeq
      }
    val actual = back.groupBy(_.getLong(0)).map { case (s, rows) =>
      s -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    }
    assert(actual == expected)
  }

  test("writeTarShards: gzip variant inflates through the same parseTar walk") {
    val docs = (1L to 30L).map(i => (i, s"z$i")).toDF("id", "body")
    val out = tmpDir("targz")
    Export.writeTarShards(docs, col("id"),
      format_string("%05d.txt", col("id")), col("body"),
      nShards = 2, outDir = out, gzip = true)
    val files = new java.io.File(out).listFiles.map(_.getName).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".tar.gz")))
    val n = Archives.parseTar(
      spark.read.format("binaryFile").load(s"$out/*.tar.gz")
        .select(lit(0L).as("file_id"), col("content").as("payload")))
      .count()
    assert(n == 30)
  }

  test("writeTarShards: several shards rolling through one task stay separate") {
    // nShards = 8 over 8 tasks: murmur3(shard) % 8 collides for some pair,
    // so at least one task writes 2+ tars — the roll path. All 8 shards
    // land regardless (200 ids hit every bucket of 8).
    val docs = (1L to 200L).map(i => (i, "x")).toDF("id", "body")
    val out = tmpDir("tarroll")
    Export.writeTarShards(docs, col("id"),
      format_string("%d.txt", col("id")), col("body"),
      nShards = 8, outDir = out)
    val shards = new java.io.File(out).listFiles.map(_.getName).sorted
    assert(shards.length == 8)
  }

  test("softDedupWeights: planted clusters of size 1/2/3 weight 1, 1/2, 1/3") {
    val df = Seq(
      (1L, "solo"), (2L, "pair"), (3L, "pair"),
      (4L, "trio"), (5L, "trio"), (6L, "trio")).toDF("id", "k")
    val got = Dedup.softDedupWeights(df, col("k"))
      .select(col("id"), col("n_dups"), col("weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == Seq(
      (1L, 1L, 1.0), (2L, 2L, 0.5), (3L, 2L, 0.5),
      (4L, 3L, 1.0 / 3), (5L, 3L, 1.0 / 3), (6L, 3L, 1.0 / 3)))
  }

  test("softDedupWeights: cluster weights sum to one document each") {
    val d = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
    val total = Dedup.softDedupWeights(
        d.unionByName(d.withColumn("doc_id", col("doc_id") + 5000)), col("text"))
      .agg(sum(col("weight"))).head.getDouble(0)
    val nUnique = d.select(countDistinct(col("text"))).head.getLong(0)
    assert(math.abs(total - nUnique) < 1e-6)
  }

  test("clusterBalancedSample: caps k per cluster and replays kPerGroup's pick") {
    val e = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "embeddings")
    val k = 3
    val sampled = Similarity.clusterBalancedSample(e, "vec_id", "embedding",
      nCentroids = 4, k = k)
    val perCluster = sampled.groupBy(col("cluster")).count().collect()
    assert(perCluster.forall(_.getLong(1) <= k))
    // the pick is exactly kPerGroup over the full assignment
    val cents = Similarity.seedCentroids(e, "vec_id", "embedding", 4)
    val assigned = e.withColumn("cluster",
      Similarity.ivfBucket(col("embedding"), cents).cast("int"))
    val expect = Sampling.kPerGroup(assigned, Seq(col("cluster")), col("vec_id"), k)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = sampled.select(col("vec_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expect)
  }

  test("compactParquet: many tiny files merge to the byte-targeted count, rows intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    try {
      // 64 tiny files of ~few KB each
      spark.range(0, 6400).select(col("id"), (col("id") * 7).as("v"))
        .repartition(64)
        .write.parquet(in)
      val fs = new org.apache.hadoop.fs.Path(in)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def parquetFiles(dir: String) =
        fs.listStatus(new org.apache.hadoop.fs.Path(dir))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val inFiles = parquetFiles(in)
      assert(inFiles.length == 64)
      val totalBytes = inFiles.map(_.getLen).sum
      val n = Export.compactParquet(spark, in, out, targetBytes = totalBytes / 4)
      assert(n == 4 || n == 5) // ceil division of the measured bytes
      assert(parquetFiles(out).length == n)
      // content preserved exactly
      val a = spark.read.parquet(in).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b && a.size == 6400)
      // a target below the smallest file never SPLITS (no empty litter):
      // output file count caps at the input file count
      val out2 = s"$base/out2"
      val n2 = Export.compactParquet(spark, in, out2, targetBytes = 1L)
      assert(n2 == 64 && parquetFiles(out2).length == 64)
      assert(parquetFiles(out2).forall(_.getLen > 0))
      // hive-partitioned layouts are rejected, not silently flattened
      val pin = s"$base/pin"
      spark.range(0, 100).select(col("id"), (col("id") % 2).as("p"))
        .write.partitionBy("p").parquet(pin)
      intercept[IllegalArgumentException] {
        Export.compactParquet(spark, pin, s"$base/pout", 1000000L)
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(base))
    }
  }
}
