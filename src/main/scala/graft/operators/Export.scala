package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data EXPORT — the last mile of a curation pipeline: fan the
  * surviving corpus out into a fixed number of shards with a
  * deterministic corpus-wide shuffle order inside each shard. Trainers
  * consume shards sequentially, so the shuffle must happen at EXPORT
  * time, and it must be reproducible: the (shard, position) of a row
  * depends only on its id and the salt — not on partitioning, executor
  * count, or Spark's RNG ([[Sampling.hashBucket]] discipline, q66/q137).
  *
  * Scale posture: shard assignment is a narrow projection; the position
  * is one `row_number` per shard — a single hash-partitioned sort, which
  * is the FLOOR for any global shuffle (you cannot order a corpus
  * without one exchange). Re-salting gives an independent epoch order
  * without touching the data. [[writeShards]] materializes the layout as
  * one directory per shard with files in shuffle order.
  */
object Export {

  /** (input row) + (shard, pos): shard in [0, nShards), pos = 1-based
    * rank in the shard's deterministic shuffle order. The order key is a
    * DIFFERENT multiplier stream than the shard key (salt + 1), so
    * within-shard order is uncorrelated with shard assignment; ties on
    * the 2³⁰-bucket order hash break by id for full determinism.
    */
  def shardAssignments(
      df: DataFrame, idCol: Column, nShards: Int,
      salt: Long = 0L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val shard = Sampling.hashBucket(idCol, nShards, salt)
    val okey = Sampling.hashBucket(idCol, 1 << 30, salt + 1)
    df.withColumn("shard", shard)
      .withColumn("__okey", okey)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__okey").asc, idCol.asc)))
      .drop("__okey")
  }

  /** Write the shard fan-out: `outDir/shard=N/part-*` with rows in
    * shuffle order inside each shard's files. ONE corpus exchange: the
    * shard repartition happens FIRST, and the position window's required
    * clustering (`hashpartitioning(shard)`) is already satisfied by it —
    * EnsureRequirements adds only the in-partition sort, which is also
    * the file order the writer needs. (Calling [[shardAssignments]] then
    * repartitioning would exchange the corpus twice — the window at
    * `spark.sql.shuffle.partitions`, the write at `nShards`.)
    */
  def writeShards(
      df: DataFrame, idCol: Column, nShards: Int, outDir: String,
      salt: Long = 0L): Unit = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shard", Sampling.hashBucket(idCol, nShards, salt))
      .withColumn("__okey", Sampling.hashBucket(idCol, 1 << 30, salt + 1))
      .repartition(nShards, col("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__okey").asc, idCol.asc)))
      .drop("__okey")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** WebDataset-style tar-shard export — the layout multimodal trainers
    * stream: `outDir/shard-NNNNN.tar`, one member per row
    * (`nameCol` → member name, `payloadCol` bytes → member body), members
    * in the SAME deterministic shuffle order as [[writeShards]] (salt-
    * decorrelated shard/order hash streams; member index inside a tar ==
    * the row's `pos`). `gzip = true` writes `.tar.gz` whole-file gzip —
    * the shape [[graft.sources.Archives.parseTar]] sniffs and inflates.
    *
    * Scale posture: one corpus exchange (`repartition(nShards, shard)`);
    * each task then streams its shards' members straight through the
    * Hadoop FileSystem API (file:// here, HDFS/S3 on a cluster) — member
    * bytes never accumulate on the heap, and several shards hashing into
    * one task roll file-to-file in sort order. Shard files are created
    * with overwrite=true so a task retry rewrites the same deterministic
    * content idempotently. Size shards via `nShards` so a single tar
    * stays well under the 2 GB binaryFile read-back bound.
    */
  def writeTarShards(
      df: DataFrame, idCol: Column, nameCol: Column, payloadCol: Column,
      nShards: Int, outDir: String, salt: Long = 0L,
      gzip: Boolean = false): Unit = {
    require(nShards > 0, "nShards must be positive")
    val arranged = df
      .select(idCol.cast("long").as("__id"), nameCol.cast("string").as("__name"),
        payloadCol.cast("binary").as("__payload"))
      .withColumn("__shard", Sampling.hashBucket(col("__id"), nShards, salt))
      .withColumn("__okey", Sampling.hashBucket(col("__id"), 1 << 30, salt + 1))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__okey"), col("__id"))
    val ext = if (gzip) ".tar.gz" else ".tar"
    arranged.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val base = new org.apache.hadoop.fs.Path(outDir)
        // a PRIVATE FileSystem instance (newInstance, not the JVM-cached
        // get): setWriteChecksum on the cached singleton would disable
        // .crc sidecars for EVERY later file:// write in this executor —
        // a global side effect smuggled out of a per-partition helper
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(
          base.toUri, new org.apache.hadoop.conf.Configuration())
        // ChecksumFileSystem (file://) would otherwise drop a .crc sidecar
        // next to every shard — litter a trainer globbing outDir must not
        // see; no-op on filesystems with internal checksums (HDFS/S3A)
        fs.setWriteChecksum(false)
        var cur = -1L
        var out: java.io.OutputStream = null
        def closeCurrent(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero end-of-archive blocks
          out.close(); out = null
        }
        try {
          it.foreach { r =>
            val shard = r.getLong(r.fieldIndex("__shard"))
            if (shard != cur) {
              closeCurrent()
              cur = shard
              val raw: java.io.OutputStream =
                fs.create(new org.apache.hadoop.fs.Path(base, f"shard-$cur%05d$ext"), true)
              out = if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
            }
            out.write(graft.sources.Archives.tarMember(
              r.getString(r.fieldIndex("__name")),
              r.getAs[Array[Byte]](r.fieldIndex("__payload"))))
          }
        } finally {
          try closeCurrent() finally fs.close()
        }
      }
    }
  }

  /** Small-file compaction: rewrite a FLAT parquet directory into files
    * of roughly `targetBytes` each. The small-files problem is the
    * classic failure mode of incremental ingestion at scale — a 100 TB
    * table accreted in 10k-row micro-batches ends up as millions of
    * KB-sized files, and every downstream scan pays a task + open +
    * footer-read per file. Compaction here is ZERO-shuffle: the scan is
    * split at `targetBytes` (maxPartitionBytes, restored afterwards) so
    * the partition count is never BELOW the target file count — coalesce
    * can only merge, not split — and the rewrite uses `coalesce`
    * (partition merge, no exchange), so the cost is one read+write pass.
    *
    * Hive-partitioned layouts are rejected: a flat rewrite would demote
    * the partition columns to data columns and break directory-level
    * pruning — compact each leaf partition directory individually.
    *
    * Writes to `outDir` (caller swaps directories atomically at the
    * catalog/manifest layer — an in-place rewrite that crashes mid-way
    * would lose data). Returns the ACTUAL output file count (measured,
    * not estimated).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.listStatus(path).exists(s =>
        s.isDirectory && s.getPath.getName.contains("=")),
      s"$inDir is hive-partitioned; compact each leaf directory " +
        "individually (a flat rewrite would drop the partitioning)")
    // data files = visible non-marker files: Hive/Impala write
    // extension-less part-00000 names, so an ".parquet"-suffix count
    // would see 0 inputs and collapse the rewrite to one file
    def dataFiles(p: org.apache.hadoop.fs.Path) =
      fs.listStatus(p).count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val totalBytes = fs.getContentSummary(path).getLength
    // capped at the input file count: compaction MERGES, never splits — a
    // target below the current average file size would otherwise ask for
    // more outputs than inputs, and byte-range splitting cannot divide a
    // parquet file below its row groups (empty part-files as litter)
    val inputFiles = dataFiles(path)
    val nFiles = math.min(math.max(1, inputFiles),
      math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt))
    // an ISOLATED session carries the scan-split override: setting
    // spark.sql.files.maxPartitionBytes on the shared session would
    // resize every concurrent query's scan partitions, and overlapping
    // compactParquet calls would race the save/restore
    val session = spark.newSession()
    session.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    session.read.parquet(inDir)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    dataFiles(new org.apache.hadoop.fs.Path(outDir))
  }
}
