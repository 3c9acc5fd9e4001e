package graft

import graft.functions.BpeCount
import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Plain-Scala reference of the greedy single-rank merge scan. */
  private def refCounts(text: String, merges: Set[String]): (Int, Int) = {
    var chars = 0
    var tokens = 0
    text.split("\\s+").filter(_.nonEmpty).foreach { w =>
      val cps = w.codePoints().toArray
      chars += cps.length
      var i = 0
      while (i < cps.length) {
        if (i + 1 < cps.length && merges.contains(new String(cps, i, 2))) { tokens += 1; i += 2 }
        else { tokens += 1; i += 1 }
      }
    }
    (chars, tokens)
  }

  test("hand-computed merges: 'th' and 'he' in table, greedy left-to-right") {
    val merges = Seq("th", "he")
    // "the" -> greedy takes "th" then "e": 2 tokens (not "t"+"he")
    val rows = Seq("the", "he the thee", "", "a").toDF("text")
      .select(BpeCount.expr(col("text"), merges).as("b"))
      .select(col("b.n_chars"), col("b.n_tokens")).as[(Int, Int)].collect().toSeq
    assert(rows(0) == ((3, 2)))
    assert(rows(1) == ((9, 6)))  // he=1, th+e=2, th+e+e=3
    assert(rows(2) == ((0, 0)))
    assert(rows(3) == ((1, 1)))
  }

  test("kernel == scalar reference on real docs + unicode edges") {
    val merges = Bpe.trainMerges(
      graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents"),
      col("text"), m = 64)
    assert(merges.length == 64)
    val edges = Seq("汉字汉字 汉字", "a🎉b 🎉🎉", "  ", "xx")
    val docs = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
      .select(col("text")).as[String].collect().toSeq ++ edges
    val got = docs.toDF("text")
      .select(BpeCount.expr(col("text"), merges).as("b"))
      .select(col("b.n_chars"), col("b.n_tokens")).as[(Int, Int)].collect().toSeq
    val ms = merges.toSet
    docs.zip(got).foreach { case (s, g) =>
      assert(g == refCounts(s, ms), s.take(40))
    }
  }

  test("trainMerges pair stream matches the kernel's pair enumeration") {
    // a table trained on a corpus must cover the kernel's merges: train on
    // a tiny corpus where expected pairs are computable by hand
    val df = Seq("aaab aaab", "abab").toDF("text")
    // pairs: "aaab"x2 -> aa,aa,ab per occurrence; "abab" -> ab,ba,ab
    // counts: aa=4, ab=4, ba=1 -> top2 by (count desc, pair asc) = [aa, ab]
    val merges = Bpe.trainMerges(df, col("text"), m = 2)
    assert(merges == Seq("aa", "ab"))
    // greedy on "aaab": aa + ab = 2 tokens; on "abab": ab + ab = 2
    val counts = df.select(BpeCount.expr(col("text"), merges).as("b"))
      .select(col("b.n_tokens")).as[Int].collect().toSeq
    assert(counts == Seq(4, 2))
  }

  test("compression is monotone in table size on the real corpus") {
    val d = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
    def totalTokens(m: Int): Long = {
      val merges = Bpe.trainMerges(d, col("text"), m)
      Bpe.tokenCounts(d, col("doc_id"), col("text"), merges)
        .agg(sum(col("n_tokens"))).as[Long].collect().head
    }
    val t8 = totalTokens(8)
    val t64 = totalTokens(64)
    val chars = d.select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .select(aggregate(col("t"), lit(0L), (a, w) => a + length(w)).as("c"))
      .agg(sum(col("c"))).as[Long].collect().head
    assert(t64 < t8 && t8 < chars,
      s"more merges must compress more: chars=$chars t8=$t8 t64=$t64")
  }
}
