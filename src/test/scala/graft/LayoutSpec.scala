package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    (0 until 31).foreach { i =>
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zOrderKey equals the bitwise reference interleave") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (4095L, 4095L),
      (12345L, 54321L), ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1),
      ((1L << 31) - 1, (1L << 31) - 1))
    val df = cases.toDF("x", "y")
    val out = df.select(col("x"), col("y"),
      Layout.zOrderKey(col("x"), col("y")).as("z")).collect()
    out.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order locality: key ordering interleaves both dimensions") {
    // within one 2x2 cell the four points are consecutive in z order —
    // the property file-level min/max pruning rests on
    assert(mortonRef(0, 0) == 0 && mortonRef(1, 0) == 1 &&
      mortonRef(0, 1) == 2 && mortonRef(1, 1) == 3)
    // and the next cell starts after them
    assert(mortonRef(2, 0) == 4)
  }

  test("writeZOrdered: files carry disjoint z ranges and both-dim envelopes") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      val df = spark.range(0, 4096).select(
        (col("id") % 64).as("x"), expr("id div 64").as("y"),
        col("id").as("payload"))
      Layout.writeZOrdered(df, out, col("x"), col("y"), nFiles = 8)
      val back = spark.read.parquet(out)
      assert(back.count() == 4096)
      // per-file z ranges must be disjoint (range partitioning):
      val ranges = back
        .select(Layout.zOrderKey(col("x"), col("y")).as("z"),
          input_file_name().as("f"))
        .groupBy(col("f")).agg(min("z").as("lo"), max("z").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(ranges.length > 1)
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
        case _ =>
      }
      // both-dimension envelope: every file's x-range AND y-range span
      // must be far tighter than the full domain (the pruning payoff —
      // a row-order layout gives each file the full 0..63 span on x)
      // (averaged: range-partition boundaries are sample-estimated, so a
      // single straddling file may legitimately span an aligned block
      // boundary — but the MEAN envelope area must stay a small fraction
      // of the domain, where a row-order layout pins every file at the
      // full x span)
      val env = back
        .groupBy(input_file_name())
        .agg(min("x").as("xlo"), max("x").as("xhi"),
          min("y").as("ylo"), max("y").as("yhi"))
        .collect()
      val avgArea = env.map { r =>
        (r.getLong(2) - r.getLong(1) + 1).toDouble *
          (r.getLong(4) - r.getLong(3) + 1)
      }.sum / env.length
      assert(avgArea <= 64.0 * 64 / 3,
        s"mean file envelope area $avgArea — not clustered")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(out))
    }
  }
}
