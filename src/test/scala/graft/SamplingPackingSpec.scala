package graft

import graft.operators.{Mixture, Packing, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingPackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hashSplit: deterministic, partition-independent, covers all rows") {
    val ids = (1L to 10000L).toDF("id")
    val a = Sampling.hashSplit(ids, col("id"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(ids.repartition(17), col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.size == 10000 && a.values.toSet == Set("train", "val", "test"))
  }

  test("hashSplit: shares near the declared weights") {
    val ids = (1L to 10000L).toDF("id")
    val byShare = Sampling.hashSplit(ids, col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(byShare("train") - 8000L) < 400, byShare)
    assert(math.abs(byShare("val") - 1000L) < 200, byShare)
    assert(math.abs(byShare("test") - 1000L) < 200, byShare)
  }

  test("salt decorrelates assignments over the same ids") {
    val ids = (1L to 5000L).toDF("id")
    val s0 = Sampling.hashBucket(col("id"), 2)
    val s1 = Sampling.hashBucket(col("id"), 2, salt = 7L)
    val agree = ids.filter(s0 === s1).count()
    // independent fair coins agree ~50%; correlated ones ~100% or ~0%
    assert(agree > 2000 && agree < 3000, s"agree=$agree")
  }

  test("systematicSample: stable subset, sane size, sub-sample nests") {
    val ids = (1L to 10000L).toDF("id")
    val ten = Sampling.systematicSample(ids, col("id"), 0.10).as[Long].collect().toSet
    val five = Sampling.systematicSample(ids, col("id"), 0.05).as[Long].collect().toSet
    assert(math.abs(ten.size - 1000) < 150, ten.size)
    assert(five.subsetOf(ten), "smaller fraction must nest inside larger (same salt)")
  }

  test("kPerGroup: exact quota, partition-independent, WindowGroupLimit plan") {
    val df = (1L to 5000L).map(i => (i, s"g${i % 7}")).toDF("id", "g")
    val a = Sampling.kPerGroup(df, Seq(col("g")), col("id"), k = 25)
    val b = Sampling.kPerGroup(df.repartition(13), Seq(col("g")), col("id"), k = 25)
    val pickA = a.as[(Long, String)].collect().toSet
    assert(pickA == b.as[(Long, String)].collect().toSet)
    val sizes = a.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 25L) && sizes.size == 7)
    // small group: quota clamps to group size
    val tiny = Sampling.kPerGroup(df.filter(col("id") <= 3), Seq(col("g")), col("id"), 25)
    assert(tiny.count() == 3)
    // top-k per group must plan as WindowGroupLimit (k rows cross the
    // exchange, not whole groups)
    assert(a.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("stratified sampleBy keeps per-stratum fractions roughly") {
    val df = (1L to 6000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    val out = Sampling.stratified(df, "s", Map("a" -> 0.5, "b" -> 0.1), seed = 42L)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("a") - 1000L) < 200, out)
    assert(math.abs(out("b") - 400L) < 150, out)
  }

  test("concatPack: offsets are the exclusive running sum; spill keeps docs whole") {
    val docs = Seq(
      ("en", 1L, 1000L), ("en", 2L, 3000L), ("en", 3L, 500L), // 3 starts at 4000 → pack 0
      ("en", 4L, 9000L),                                      // starts 4500 → pack 1, spills
      ("en", 5L, 100L),                                       // starts 13500 → pack 3
      ("fr", 6L, 10L)                                         // own group → pack 0
    ).toDF("lang", "doc_id", "n")
    val out = Packing.concatPack(docs, Seq(col("doc_id")), col("n"), 4096L,
        groupCols = Seq(col("lang")))
      .select("doc_id", "start_offset", "pack_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (1000L, 0L))
    assert(out(3L) == (4000L, 0L))
    assert(out(4L) == (4500L, 1L))
    assert(out(5L) == (13500L, 3L))
    assert(out(6L) == (0L, 0L))
  }

  test("packStats: fill is tokens-starting-in-pack over budget") {
    val docs = Seq(("en", 1L, 4096L), ("en", 2L, 2048L)).toDF("lang", "doc_id", "n")
    val packed = Packing.concatPack(docs, Seq(col("doc_id")), col("n"), 4096L,
      groupCols = Seq(col("lang")))
    val stats = Packing.packStats(packed, col("n"), 4096L, Seq(col("lang")))
      .select("pack_id", "n_docs", "n_tokens", "fill")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(stats(0L) == (0L, 1L, 4096L, 1.0))
    assert(stats(1L) == (1L, 1L, 2048L, 0.5))
  }

  test("temperatureWeights: sums to 1, flattens toward low-resource groups") {
    // 90/9/1 split: natural shares 0.9/0.09/0.01
    val docs = (Seq.fill(90)("hi") ++ Seq.fill(9)("mid") ++ Seq("lo"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val w = Mixture.temperatureWeights(docs, Seq(col("lang")), alpha = 0.5,
        budget = 1000)
      .select("lang", "n_docs", "weight", "quota")
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(w.values.map(_._3).sum - 1.0) < 1e-12)
    // sqrt temperature: hi 9.4869/13.487 ≈ 0.7034, lo 1/13.487 ≈ 0.0741
    assert(w("hi")._3 < 0.9 && w("hi")._3 > 0.5)   // down from natural 0.90
    assert(w("lo")._3 > 0.01 && w("lo")._3 < 0.1)  // up from natural 0.01
    assert(math.abs(w.values.map(_._4).sum - 1000L) <= 2) // quota ≈ budget
    // alpha = 1 recovers the natural distribution exactly
    val nat = Mixture.temperatureWeights(docs, Seq(col("lang")), alpha = 1.0,
        budget = 100)
      .select("lang", "weight").as[(String, Double)].collect().toMap
    assert(math.abs(nat("hi") - 0.9) < 1e-12)
    assert(math.abs(nat("lo") - 0.01) < 1e-12)
  }

  test("Export: shard fan-out layout, contiguous shuffle positions, epoch re-salt") {
    import graft.operators.Export
    val docs = spark.range(0, 500).toDF("doc_id")
    val assigned = Export.shardAssignments(docs, col("doc_id"), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(assigned.length == 500)
    // positions are contiguous 1..count inside every shard
    assigned.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // a different salt yields a genuinely different within-shard order
    val epoch2 = Export.shardAssignments(docs, col("doc_id"), 8, salt = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(assigned.toSet != epoch2.toSet)
    // written layout: one directory per shard, rows complete per shard
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    try {
      Export.writeShards(docs, col("doc_id"), 8, out)
      val dirs = new java.io.File(out).listFiles
        .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
      assert(dirs == (0 until 8).map(i => s"shard=$i").toSet)
      val back = spark.read.parquet(out)
        .select(col("doc_id"), col("shard").cast("long"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(back == assigned.toSet)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(out))
    }
  }

  test("globalTopK == row_number form above the rank thresholds; rank kept") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.range(0, 30000)
      .select(col("id"), (col("id") % 41).cast("double").as("r"))
    val expect = d.withColumn("rk",
        row_number().over(Window.orderBy(col("r").desc, col("id").asc)))
      .filter(col("rk") <= 4000).select(col("id"), col("rk"))
      .as[(Long, Int)].collect().toSet
    val got = graft.operators.Ranking.globalTopK(d,
        Seq(col("r").desc, col("id").asc), 4000, rankCol = Some("rk"))
      .select(col("id"), col("rk")).as[(Long, Int)].collect().toSet
    assert(got == expect)
  }

  test("weightedSample: deterministic, salt-sensitive, weight-monotone") {
    val base = spark.range(0, 20000).select(col("id"),
      when(col("id") % 2 === 0, 2000L).otherwise(20L).as("w"))
    def sample(salt: Long) = graft.operators.Sampling.weightedSample(
        base, col("id"), col("w"), k = 1000, salt = salt)
      .select(col("id")).as[Long].collect().toSet
    val s0 = sample(0L)
    assert(s0 == sample(0L), "same salt must reproduce the same sample")
    val s1 = sample(7L)
    assert(s0 != s1, "different salts must draw different samples")
    // heavy rows (weight 2000 vs 20, half the pool each) must dominate
    val heavy = s0.count(_ % 2 == 0)
    assert(heavy > 900, s"heavy-weight rows should dominate the sample: $heavy/1000")
  }

  test("weightedSample == direct E-S ranking; null/non-positive weights excluded") {
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(0, 5000).select(col("id"),
      when(col("id") % 17 === 0, lit(null).cast("long"))
        .when(col("id") % 19 === 0, -5L)
        .otherwise(col("id") % 997 + 1).as("w"))
    val h = graft.operators.Sampling.hashBucket(col("id"), 1 << 20)
    val key = (graft.functions.Log2Fixed.expr(h + 1) - lit(20L * 1048576L))
      .cast("double") / col("w")
    val expect = base.filter(col("w") > 0).withColumn("k", key)
      .withColumn("rk", row_number().over(Window.orderBy(col("k").desc, col("id").asc)))
      .filter(col("rk") <= 300).select(col("id")).as[Long].collect().toSet
    val got = graft.operators.Sampling.weightedSample(
        base, col("id"), col("w"), k = 300)
      .select(col("id")).as[Long].collect().toSet
    assert(got == expect)
    assert(!got.exists(i => i % 17 == 0 || i % 19 == 0))
  }

  test("groupAwareSplit: no group straddles, proportions hold, salts decorrelate") {
    import graft.operators.Sampling
    val rows = (0L until 20000L).map(i => (i, s"domain-${i % 500}.org"))
      .toDF("id", "domain")
    val split = Sampling.groupAwareSplit(rows, col("domain"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    // the anti-leakage property: every domain lands in exactly ONE split
    val perGroup = split.groupBy("domain")
      .agg(countDistinct(col("split")).as("n"))
      .select(max(col("n"))).as[Long].head()
    assert(perGroup == 1L)
    // proportions near 80/10/10 over 500 domains
    val frac = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap.view.mapValues(_ / 20000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08 &&
      math.abs(frac("val") - 0.1) < 0.05 && math.abs(frac("test") - 0.1) < 0.05)
    // a different salt redraws the assignment (~weights-squared agreement,
    // not identity): two independent holdout draws must not correlate
    val s2 = Sampling.groupAwareSplit(rows, col("domain"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = 7L)
    val agree = split.select(col("id"), col("split").as("a"))
      .join(s2.select(col("id"), col("split").as("b")), "id")
      .select(avg(when(col("a") === col("b"), 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(agree > 0.5 && agree < 0.8, s"agreement=$agree") // ~0.66 expected
  }

  test("temperatureAllocationExact: quotas sum to the budget exactly on " +
      "skewed counts; isqrt weights exact; driver replica") {
    // skew: 10000 / 100 / 1 docs -> sqrt temper 100:10:1
    val docs = (Seq.fill(10000)("big") ++ Seq.fill(100)("mid") ++
      Seq.fill(1)("tiny")).toDF("src")
    val out = Mixture.temperatureAllocationExact(docs, Seq(col("src")),
      budget = 997L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.values.map(_.getAs[Long]("quota")).sum == 997L)
    // exact isqrt(n * 1e12) = floor(1e6 * sqrt(n))
    def isqrt(n: Long): Long = {
      val v = BigInt(n) * BigInt(10).pow(12)
      var s = BigInt(math.sqrt(n.toDouble).toLong) * 1000000
      while (s * s > v) s -= 1
      while ((s + 1) * (s + 1) <= v) s += 1
      s.toLong
    }
    for ((src, n) <- Seq(("big", 10000L), ("mid", 100L), ("tiny", 1L)))
      assert(out(src).getAs[Long]("w_sqrt") == isqrt(n), src)
    // driver replica of the full Hamilton apportionment
    val ws = Seq("big", "mid", "tiny").map(s => s -> out(s).getAs[Long]("w_sqrt"))
    val wTot = ws.map(_._2).sum
    val base = ws.map { case (s, w) => s -> (BigInt(w) * 997 / wTot).toLong }.toMap
    val rem = ws.map { case (s, w) => s -> (BigInt(w) * 997 % wTot) }.toMap
    val leftover = 997L - base.values.sum
    val order = ws.map(_._1).sortBy(s => (-rem(s), s))
    val want = ws.map { case (s, _) =>
      s -> (base(s) + (if (order.indexOf(s) < leftover) 1L else 0L)) }.toMap
    for (s <- want.keys)
      assert(out(s).getAs[Long]("quota") == want(s), s"$s quota")
    // sqrt tempering up-weights the tail vs natural share
    val shareTiny = out("tiny").getAs[Double]("share")
    assert(shareTiny > 1.0 / 10101.0)
  }

  test("temperatureAllocationExact: budget below the group count still " +
      "sums exactly; remainder ties break on the key ascending") {
    val docs = (1 to 5).flatMap(i => Seq.fill(9)(s"s$i")).toDF("src")
    val out = Mixture.temperatureAllocationExact(docs, Seq(col("src")),
      budget = 3L).collect()
    assert(out.map(_.getAs[Long]("quota")).sum == 3L)
    // equal weights -> equal remainders -> the 3 extras land on the
    // lexicographically smallest keys
    val got = out.map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(got == Map("s1" -> 1L, "s2" -> 1L, "s3" -> 1L,
      "s4" -> 0L, "s5" -> 0L))
  }
}
