package graft

import graft.operators.{Mixture, Packing, Sampling}
import org.apache.spark.sql.functions._

/** Scale receipts for the training-pipeline operators: synthetic inputs at
  * 10M+ rows (generated distributed via spark.range — nothing ever
  * collects), min-of-2 timings printed one per line. Not part of the
  * driver bench contract; run ad hoc per round and record in SCALE.md:
  *
  *   sbt -batch "runMain graft.Stress [rows]"
  */
object Stress {

  private def time[A](name: String, runs: Int = 2)(body: => A): Unit = {
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[stress] $name%-24s ${times.min}%8.2f s (min of $runs)")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = graft.core.GraftSession.builder("graft-stress")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ids = spark.range(0, n, 1, 32).toDF("id")
    val docs = ids.select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(32))).as("lang"),
      (pmod(col("id"), lit(1000)) + 50).as("n_chars"))

    time(s"hash_split_${n / 1000000}M") {
      Sampling.hashSplit(ids, col("id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy("split").count().collect()
    }
    time(s"systematic_sample_${n / 1000000}M") {
      Sampling.systematicSample(ids, col("id"), 0.05).count()
    }
    time(s"pack_grouped_${n / 1000000}M") {
      Packing.concatPack(docs, Seq(col("id")), col("n_chars"), 4096L,
          groupCols = Seq(col("lang")))
        .groupBy("lang").agg(max("pack_id")).collect()
    }
    time(s"mixture_1_5x_${n / 1000000}M") {
      Mixture.materializeCopies(
        Mixture.assignCopies(docs, col("id"), lit(1.5)), col("n_copies")).count()
    }

    // compiled text-signature passes (the per-byte hot path of a corpus
    // run): 40-token synthetic docs. Generation itself is interpreted-HOF
    // heavy, so the input is MATERIALIZED once (parquet, like a real
    // corpus) and each receipt times only the operator pass over it.
    val t = math.max(n / 10, 1000000L)
    val textDir = java.nio.file.Files.createTempDirectory("graft_stress_texts").toString
    try {
    spark.range(0, t, 1, 32).select(col("id"),
        array_join(transform(sequence(lit(0), lit(39)),
          j => concat(lit("w"), pmod(col("id") * (j + 7L), lit(997)))), " ").as("text"))
      .write.mode("overwrite").parquet(textDir)
    val texts = spark.read.parquet(textDir)
    time(s"poly_shingles_${t / 1000000}M_x40tok") {
      texts.select(graft.functions.PolyHash
          .polyShingleHashes(spark, col("text"), 3).as("hs"))
        .agg(sum(size(col("hs")))).collect()
    }
    time(s"minhash_sig32_${t / 1000000}M") {
      texts.select(graft.functions.PolyHash
          .polyShingleHashes(spark, col("text"), 3).as("hs"))
        .filter(size(col("hs")) > 0)
        .select(graft.functions.MinHashSig.expr(col("hs"), 32).as("sig"))
        .agg(sum(element_at(col("sig"), 1))).collect()
    }
    time(s"poly_simhash_${t / 1000000}M") {
      // signatures reach 2^60 — reduce before summing or the agg overflows
      texts.select(graft.functions.PolyHash.polySimHash(spark, col("text")).as("s"))
        .agg(sum(pmod(col("s"), lit(1000003L)))).collect()
    }
    time(s"char_trigrams_${t / 1000000}M") {
      // LM-scorer hot path: one compiled pass per row, ~250 chars each
      texts.select(graft.functions.CharTrigramHashes.expr(col("text")).as("th"))
        .agg(sum(size(col("th")))).collect()
    }
    time(s"repetition_${t / 1000000}M") {
      texts.select(graft.functions.RepetitionStats.expr(col("text"), 2, 3).as("r"))
        .agg(sum(col("r.top_frac")), sum(col("r.dup_frac"))).collect()
    }

    val m = math.max(n / 10, 1000000L)
    val vecs = spark.range(0, m, 1, 32).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => pmod(col("id") * (j + 1L), lit(97)).cast("float")).as("embedding"))
    time(s"quantize_${m / 1000000}M_x64") {
      vecs.select(graft.functions.QuantizeStats.expr(col("embedding")).as("q"))
        .agg(sum(col("q.q_sum"))).collect()
    }
    time(s"l2norm_${m / 1000000}M_x64") {
      vecs.select(graft.functions.L2Norm.expr(col("embedding")).as("nrm"))
        .agg(sum(col("nrm"))).collect()
    }
    } finally {
      // the materialized text fixture is t × ~250 B — delete it even when
      // a timed pass throws, rather than leak hundreds of MB of tmpdir
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(textDir))
    }
    spark.stop()
  }
}
