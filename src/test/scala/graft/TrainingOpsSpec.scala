package graft

import graft.functions.{L2Norm, QuantizeStats, TextFunctions}
import graft.operators.{Contamination, Mixture, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topNgramFrac: modal 2-gram share, hand-computed") {
    // "a b a b a" -> 2-grams: [a b, b a, a b, b a] -> modal count 2 of 4
    val df = Seq("a b a b a", "x y z", "only", "").toDF("text")
      .select(TextFunctions.topNgramFrac(col("text"), 2).as("f"))
    assert(df.as[Double].collect().toSeq == Seq(0.5, 0.5, 0.0, 0.0))
  }

  test("dupNgramFrac: duplicate 3-gram fraction, hand-computed") {
    // "a b c a b c a" -> 3-grams: [abc, bca, cab, abc, bca] -> 5 total, 3 distinct
    val df = Seq("a b c a b c a", "a b c d", "a b").toDF("text")
      .select(TextFunctions.dupNgramFrac(col("text"), 3).as("f"))
    assert(df.as[Double].collect().toSeq == Seq(0.4, 0.0, 0.0))
  }

  test("compiled RepetitionStats == composable HOF forms on real documents") {
    // boundary fraction: 641 tokens → 640 bigrams, modal count 3 → 3/640,
    // whose double sits just below the decimal rounding tie at 6 places —
    // distinguishes decimal-string HALF_UP (Spark round) from binary-exact
    val boundary = "x y x y x y " + (1 to 635).map(i => s"t$i").mkString(" ")
    val docs = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
      .select(col("text"))
      .unionByName(Seq("a b a b a", "a b c a b c a", "x y z", "only", "", "  ", boundary)
        .toDF("text"))
    val diff = docs.select(
        graft.functions.RepetitionStats.expr(col("text"), 2, 3).as("r"),
        TextFunctions.topNgramFrac(col("text"), 2).as("t"),
        TextFunctions.dupNgramFrac(col("text"), 3).as("d"))
      .filter(not(col("r.top_frac") <=> col("t")) || not(col("r.dup_frac") <=> col("d")))
      .count()
    assert(diff == 0)
  }

  test("contamination overlap: hand-built benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown" + "quick brown fox"
      (2L, "completely different words here now"),
      (3L, "a b")                           // too short for 3-grams
    ).toDF("id", "text")
    val bench = Seq("the quick brown fox ran").toDF("text")
    val out = Contamination.overlapStats(docs, col("id"), col("text"),
        bench, col("text"), k = 3)
      .select("doc_id", "n_sh", "n_hit", "contam_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 3L, 2L, 0.666667))
    assert(out(2L) == (2L, 3L, 0L, 0.0))
    assert(out(3L) == (3L, 0L, 0L, 0.0))
  }

  test("overlapStats keeps null-text docs as uncontaminated (not dropped)") {
    val docs = Seq((1L, "the quick brown fox"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val bench = Seq("the quick brown cat").toDF("text")
    val out = Contamination.overlapStats(docs, col("id"), col("text"),
        bench, col("text"), k = 3)
      .select("doc_id", "n_sh", "n_hit", "contam_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) == (2L, 0L, 0L, 0.0))
    val kept = Contamination.decontaminate(docs, col("id"), col("text"),
      bench, col("text"), k = 3, maxFrac = 0.5).select("id").as[Long].collect().toSet
    assert(kept.contains(2L), "null-text doc cannot be contaminated; must be kept")
  }

  test("decontaminate keeps only low-overlap docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely different words here now today")
    ).toDF("id", "text")
    val bench = Seq("the quick brown fox jumps over lazy").toDF("text")
    val kept = Contamination.decontaminate(docs, col("id"), col("text"),
      bench, col("text"), k = 3, maxFrac = 0.5).select("id").as[Long].collect()
    assert(kept.toSeq == Seq(2L))
  }

  test("mixture copies: whole + fractional parts, deterministic and nested") {
    val ids = (1L to 10000L).toDF("id")
    val out = Mixture.assignCopies(ids, col("id"), lit(2.5))
      .select("id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out.values.forall(c => c == 2L || c == 3L))
    val extra = out.count(_._2 == 3L)
    assert(math.abs(extra - 5000) < 300, s"extra=$extra")
    // nested: the rows boosted at w=2.25 are a subset of those at w=2.5
    val out25 = Mixture.assignCopies(ids, col("id"), lit(2.25))
      .select("id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out25.filter(_._2 == 3L).keySet.subsetOf(out.filter(_._2 == 3L).keySet))
    // and the fractional selector is exactly Sampling's bucket rule
    val byHash = ids.select(col("id"),
        Sampling.hashBucket(col("id"), 10000).as("b")).as[(Long, Long)].collect().toMap
    out.foreach { case (id, c) => assert((c == 3L) == (byHash(id) < 5000L)) }
  }

  test("materializeCopies: row multiplicity equals n_copies, zero drops") {
    val df = Seq((1L, 0L), (2L, 1L), (3L, 3L)).toDF("id", "n_copies")
    val out = Mixture.materializeCopies(df, col("n_copies"))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 1L, 3L -> 3L))
  }

  test("L2Norm matches composable aggregate form") {
    val df = Seq(Array(3f, 4f), Array(0f, 0f), Array(1f, 1f, 1f, 1f)).toDF("v")
    val got = df.select(L2Norm.expr(col("v")).as("n")).as[Double].collect().toSeq
    assert(got == Seq(5.0, 0.0, 2.0))
    val composable = df.select(
      sqrt(aggregate(col("v"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .as[Double].collect().toSeq
    assert(got == composable)
  }

  test("fixedChunks: offsets, overlap, tail coverage, short docs") {
    import graft.operators.Chunker
    val df = Seq(
      (1L, "a" * 500),   // 200/50: offsets 0,150,300 -> 3 chunks (300+200=500 covers tail)
      (2L, "b" * 501),   // needs a 4th chunk at 450 (451..501)
      (3L, "c" * 100),   // shorter than size -> 1 chunk
      (4L, "")           // empty -> 1 empty chunk
    ).toDF("id", "text")
    val out = Chunker.fixedChunks(df, col("text"), size = 200, overlap = 50)
      .groupBy("id").agg(count(lit(1)).as("n"), max(length(col("chunk"))).as("mx"),
        min(length(col("chunk"))).as("mn"))
      .as[(Long, Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (3L, 200, 200))
    assert(out(2L) == (4L, 200, 51))   // last chunk 451..501 = 51 chars
    assert(out(3L) == (1L, 100, 100))
    assert(out(4L) == (1L, 0, 0))
    // consecutive chunks overlap by exactly 50 chars
    val chunks = Chunker.fixedChunks(df.filter(col("id") === 1L), col("text"), 200, 50)
      .orderBy("chunk_idx").select("chunk").as[String].collect()
    assert(chunks.sliding(2).forall { case Array(a, b) => a.takeRight(50) == b.take(50) })
  }

  test("redactPii: emails and phones become typed placeholders") {
    val df = Seq(
      "mail a.user+tag@sub.example.org now or call +86-123-4567",
      "no pii here",
      "two mails: x@y.io and z.w@v.co plus +1-555-0100"
    ).toDF("t")
    val out = df.select(
        TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.countMatches(col("t"), TextFunctions.EmailRegex).as("e"),
        TextFunctions.countMatches(col("t"), TextFunctions.PhoneRegex).as("p"))
      .as[(String, Int, Int)].collect().toSeq
    assert(out(0) == ("mail [EMAIL] now or call [PHONE]", 1, 1))
    assert(out(1) == ("no pii here", 0, 0))
    assert(out(2) == ("two mails: [EMAIL] and [EMAIL] plus [PHONE]", 2, 1))
  }

  test("QuantizeStats: hand-computed codeword summary") {
    val df = Seq(
      Array(1.0f, -1.0f, 0.5f),  // maxabs 1 -> q = [127, -127, 64(63.5+.5 floor)] sum 64, sat 2
      Array(0f, 0f)              // zero vector -> all zero
    ).toDF("v")
    val out = df.select(QuantizeStats.expr(col("v")).as("q"))
      .select(col("q.n_dims"), col("q.maxabs"), col("q.q_sum"), col("q.n_sat"))
      .as[(Int, Double, Long, Int)].collect().toSeq
    assert(out == Seq((3, 1.0, 64L, 2), (2, 0.0, 0L, 0)))
  }
}
