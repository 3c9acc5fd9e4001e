package graft

import graft.functions.MultiPatternHits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultiPatternSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hits(text: String, patterns: Seq[String]): Seq[String] = {
    val df = Seq(Tuple1(text)).toDF("t")
    df.select(MultiPatternHits.expr(col("t"), patterns).as("h"))
      .collect()(0).getSeq[String](0)
  }

  test("single-pass automaton agrees with naive per-pattern contains") {
    val pats = Seq("he", "she", "his", "hers", "sher")
    // classic AC example: "ushers" contains she, he, hers, sher
    assert(hits("ushers", pats) == Seq("he", "hers", "she", "sher"))
  }

  test("fail links: overlapping patterns found across a shared prefix") {
    // after reading "ab" the automaton must fall back to match "bc"
    assert(hits("abc", Seq("ab", "bc")) == Seq("ab", "bc"))
    // a failed long match must still surface the shorter suffix pattern
    assert(hits("abcx", Seq("abcd", "bcx")) == Seq("bcx"))
  }

  test("substring-of-pattern pairs both reported; output sorted distinct") {
    val pats = Seq("table scan", "scan")
    assert(hits("a table scan here", pats) == Seq("scan", "table scan"))
    assert(hits("scan only", pats) == Seq("scan"))
    // repeated occurrences do not duplicate the hit set
    assert(hits("scan scan scan", Seq("scan")) == Seq("scan"))
  }

  test("token-boundary-crossing patterns match (substring semantics)") {
    assert(hits("big batch batch job", Seq("atch ba")) == Seq("atch ba"))
  }

  test("no match yields empty array; null text yields null") {
    assert(hits("nothing here", Seq("absent")).isEmpty)
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
    val out = df.select(
      MultiPatternHits.expr(col("t"), Seq("x")).as("h")).collect()
    assert(out(0).isNullAt(0))
  }

  test("unicode patterns and text") {
    assert(hits("数据管道的质量规则", Seq("管道", "质量", "缺失")) ==
      Seq("管道", "质量"))
  }

  test("10k-pattern dictionary: one pass finds the planted needles") {
    val rnd = new scala.util.Random(7)
    val noise = Seq.fill(10000)(rnd.alphanumeric.take(12).mkString)
    val pats = noise ++ Seq("needle one", "needle two")
    val text = "hay " * 1000 + "needle one more hay needle two end"
    assert(hits(text, pats) == Seq("needle one", "needle two"))
  }

  test("empty or null patterns rejected") {
    intercept[IllegalArgumentException] {
      MultiPatternHits(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq.empty)
    }
    intercept[IllegalArgumentException] {
      MultiPatternHits(org.apache.spark.sql.catalyst.expressions.Literal("x"),
        Seq(""))
    }
  }

  test("automaton build matches brute force on random dictionaries") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 20).foreach { _ =>
      val pats = (1 to 8).map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(60)
      val expected = pats.filter(text.contains).sorted
      assert(hits(text, pats) == expected, s"pats=$pats text=$text")
    }
  }
}
