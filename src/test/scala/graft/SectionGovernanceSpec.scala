package graft

import graft.operators.{Chunker, Divergence, QualityRules, TableOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Section-aware chunking (q216), k-anonymity (q217), readability (q218)
  * and per-source KL divergence (q219).
  */
class SectionGovernanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sectionChunks: scope rules — h2 resets under a new h1, pre-header = section 0") {
    val md = Seq((1L, Seq(
      "intro line",          // before any header -> section 0
      "# One",               // section 1, h1=One
      "a", "b",
      "## Sub1",             // section 2, h1=One h2=Sub1
      "c",
      "# Two",               // section 3, h1=Two, h2 must NOT leak Sub1
      "d",
      "## Sub2",             // section 4, h1=Two h2=Sub2
      "",                    // empty body line counts
      "### not a header e"   // ### is not h1/h2 -> body
    ).mkString("\n"))).toDF("id", "md")
    val got = Chunker.sectionChunks(md, col("id"), col("md"))
      .collect().map(r => r.getLong(1) ->
        (Option(r.getString(2)), Option(r.getString(3)), r.getLong(4),
          r.getString(5))).toMap
    assert(got(0L) == ((None, None, 1L, "intro line")))
    assert(got(1L) == ((Some("One"), None, 2L, "a\nb")))
    assert(got(2L) == ((Some("One"), Some("Sub1"), 1L, "c")))
    assert(got(3L) == ((Some("Two"), None, 1L, "d"))) // no Sub1 leak
    assert(got(4L) == ((Some("Two"), Some("Sub2"), 2L, "\n### not a header e")))
  }

  test("sectionChunks: header-only section has empty body") {
    val md = Seq((1L, "# A\n# B\nbody")).toDF("id", "md")
    val got = Chunker.sectionChunks(md, col("id"), col("md"))
      .collect().map(r => r.getLong(1) -> (r.getString(2), r.getLong(4), r.getString(5)))
      .toMap
    assert(got(1L) == (("A", 0L, "")))
    assert(got(2L) == (("B", 1L, "body")))
  }

  test("sectionChunks: empty and null documents yield NO rows (no phantom section 0)") {
    val md = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "x"))
      .toDF("id", "md")
    val got = Chunker.sectionChunks(md, col("id"), col("md")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    assert(got.head.getString(5) == "x")
  }

  test("readability: null text stays null in every count (oracle twin contract)") {
    val docs = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r = QualityRules.readability(docs, col("id"), col("text")).collect().head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("kAnonymity: class sizes, null quasi values form their own class, guard") {
    val df = Seq(
      ("US", "A", 1L), ("US", "A", 2L), ("US", "B", 3L),
      (null.asInstanceOf[String], "A", 4L), (null.asInstanceOf[String], "A", 5L)
    ).toDF("country", "seg", "id")
    val got = TableOps.kAnonymity(df, Seq(col("country"), col("seg")), k = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("group_size"), r.getAs[Int]("suppressed"))).toMap
    assert(got(1L) == ((2L, 0)) && got(2L) == ((2L, 0)))
    assert(got(3L) == ((1L, 1)))
    assert(got(4L) == ((2L, 0)) && got(5L) == ((2L, 0))) // null class
    val e = intercept[IllegalArgumentException] {
      TableOps.kAnonymity(df.withColumnRenamed("id", "suppressed"),
        Seq(col("country")), 2)
    }
    assert(e.getMessage.contains("suppressed"))
  }

  test("readability: known syllables and grade; degenerate docs -> null grade") {
    val docs = Seq(
      (1L, "the cat sat. a dog ran away."), // 7 words; syl: 1+1+1+1+1+1+2=8; 2 sents
      (2L, "xyz qrs"),                      // no vowels -> 1 each; no terminator -> 1 sent
      (3L, "")                              // no words
    ).toDF("id", "text")
    val got = QualityRules.readability(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.toString.toDouble))).toMap
    assert(got(1L)._1 == 7L && got(1L)._2 == 2L && got(1L)._3 == 8L)
    val expected1 =
      math.floor((0.39 * 7 / 2 + 11.8 * 8 / 7 - 15.59) * 100 + 0.5) / 100
    assert(got(1L)._4.contains(expected1))
    assert(got(2L) == ((2L, 1L, 2L, Some(
      math.floor((0.39 * 2 / 1 + 11.8 * 2 / 2 - 15.59) * 100 + 0.5) / 100))))
    assert(got(3L) == ((0L, 0L, 0L, None)))
  }

  test("klBySource: uniform source sits near zero, skewed source spikes") {
    val mk = (w: String, n: Int) => Seq.fill(n)(w).mkString(" ")
    // balanced corpus vocabulary; src_skew only ever says "alpha"
    val docs = Seq(
      ("src_flat", mk("alpha", 5) + " " + mk("beta", 5) + " " + mk("gamma", 5)),
      ("src_flat2", mk("alpha", 5) + " " + mk("beta", 5) + " " + mk("gamma", 5)),
      ("src_skew", mk("alpha", 15))).toDF("source", "text")
    val got = Divergence.klBySource(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("src_flat") == got("src_flat2"))
    assert(got("src_flat")._1 == 15L && got("src_flat")._2 == 3L)
    assert(got("src_skew")._2 == 1L)
    assert(got("src_skew")._3 > got("src_flat")._3 + 0.3,
      s"skewed source must diverge more: $got")
    assert(math.abs(got("src_flat")._3) < 0.2, s"flat source near corpus: $got")
  }

  test("tCloseness: hand-checked ordered EMD; mirror class reads 0; " +
      "missing values accumulate global mass; m=1 reads 0") {
    // global: v=0 ×4, v=1 ×4 (N=8, m=2). class A = (0,0,1,1) mirrors the
    // global -> t = 0. class B = (0,0,0,0): cum gaps |4*8-4*4|=16 at v=0,
    // 0 at v=1 -> t = 16/(4*8*1) = 0.5.
    val df = (Seq.fill(2)(("A", 0L)) ++ Seq.fill(2)(("A", 1L)) ++
      Seq.fill(4)(("B", 0L)) ++ Seq.fill(2)(("C", 1L)))
      .toDF("g", "v")
    // recompute: global v0=6, v1=4, N=10, m=2
    // A: cumP(v0)=2/4 vs 6/10 -> |2*10-6*4|=4; t=4/(4*10*1)=0.1
    // B: |4*10-6*4|=16; t=16/(4*10)=0.4
    // C (v=1 only, v0 MISSING): |0*10-6*2|=12; t=12/(2*10)=0.6
    val got = TableOps.tCloseness(df, Seq(col("g")), col("v"),
      tMicro = 150000L).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("t"), r.getAs[Int]("within_t"),
          r.getAs[Long]("m_values"))).toMap
    assert(got("A") == ((0.1, 1, 2L)), s"A: ${got("A")}")
    assert(got("B") == ((0.4, 0, 2L)), s"B: ${got("B")}")
    assert(got("C") == ((0.6, 0, 2L)), s"C: ${got("C")}")
    // perfectly mirroring class: t = 0
    val mirror = (Seq.fill(3)(("M", 0L)) ++ Seq.fill(2)(("M", 1L)) ++
      Seq.fill(3)(("O", 0L)) ++ Seq.fill(2)(("O", 1L))).toDF("g", "v")
    val m = TableOps.tCloseness(mirror, Seq(col("g")), col("v"), 150000L)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("t")).toMap
    assert(m("M") == 0.0 && m("O") == 0.0)
    // single global value: m = 1 -> t = 0, within by definition
    val one = Seq(("X", 7L), ("Y", 7L)).toDF("g", "v")
    val o = TableOps.tCloseness(one, Seq(col("g")), col("v"), 0L)
      .collect().head
    assert(o.getAs[Double]("t") == 0.0 && o.getAs[Int]("within_t") == 1)
    // fail-loud value-domain guard
    val wide = (1L to 100L).map(i => ("W", i)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      TableOps.tCloseness(wide, Seq(col("g")), col("v"), 0L, maxValues = 8)
    }
    assert(e.getMessage.contains("maxValues"))
  }
}
