package graft

import org.apache.spark.sql.functions._

object ProfSkew {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("profskew", 32)
    spark.sparkContext.setLogLevel("WARN")
    val nKeys = 100000L
    val nSalt = 64
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prof_skew").toString
    spark.range(0, 10000000L, 1, 32).select(
        when(pmod(col("id"), lit(10)) < 3, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
        col("id").as("fact_id"),
        lpad(hex(xxhash64(col("id"), lit(1L))), 96, "x").as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, nKeys).select(col("id").as("k"),
        hex(xxhash64(col("id"))).as("dim_val"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sf = fact.withColumn("salt",
      pmod(xxhash64(col("fact_id")), lit(nSalt.toLong)))
    val sd = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(nSalt - 1L))))
    val j = sf.hint("merge").join(sd, Seq("k", "salt"))
      .agg(count(lit(1)), sum(length(col("payload")) + length(col("dim_val"))))
    val maxMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskInfo != null)
            maxMs.getAndUpdate(x => math.max(x, te.taskInfo.duration)): Unit
      })
    val t0 = System.nanoTime
    j.collect()
    println(f"C_ALONE wall ${(System.nanoTime-t0)/1e9}%.2f s max_task ${maxMs.get()/1000.0}%.2f s")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
