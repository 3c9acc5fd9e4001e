package graft

import graft.functions.{CharEntropy, Log2Fixed}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntropySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Plain-Scala reference of the kernel's integer formula. */
  private def refEntropy(s: String): (Int, Long) = {
    if (s.isEmpty) return (0, 0L)
    val counts = scala.collection.mutable.Map.empty[Int, Long]
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts(cp) = counts.getOrElse(cp, 0L) + 1
      n += 1
      i += Character.charCount(cp)
    }
    val lgN = Log2Fixed(n.toLong)
    (n, counts.values.map(c => c * (lgN - Log2Fixed(c))).sum)
  }

  test("CharEntropy: hand-computed boundary values") {
    val rows = Seq("", "aaaa", "ab", "abcd").toDF("text")
      .select(CharEntropy.expr(col("text")).as("e"))
      .select(col("e.n_chars"), col("e.ent_fp"))
      .as[(Int, Long)].collect().toSeq
    assert(rows(0) == ((0, 0L)))
    assert(rows(1) == ((4, 0L)))            // single symbol: zero entropy
    assert(rows(2) == ((2, 2L * Log2Fixed.One)))   // 1 bit over 2 chars
    assert(rows(3) == ((4, 8L * Log2Fixed.One)))   // 2 bits over 4 chars
  }

  test("CharEntropy kernel == scalar reference on real docs + unicode edges") {
    val edges = Seq("汉字汉字", "a🎉b🎉", "\n\n\t ", "x")
    val docs = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "documents")
      .select(col("text")).as[String].collect().toSeq ++ edges
    val got = docs.toDF("text")
      .select(CharEntropy.expr(col("text")).as("e"))
      .select(col("e.n_chars"), col("e.ent_fp"))
      .as[(Int, Long)].collect().toSeq
    docs.zip(got).foreach { case (s, g) =>
      assert(g == refEntropy(s), s.take(40))
    }
  }

  test("entropy orders garbled vs repetitive text correctly") {
    val ent = Seq("the the the the the the", "q9$Zk!w@7#pL^2&xG*4(vB)")
      .toDF("text")
      .select(CharEntropy.expr(col("text")).as("e"))
      .select(col("e.ent_fp").cast("double") / (col("e.n_chars") * Log2Fixed.One))
      .as[Double].collect().toSeq
    assert(ent(1) > ent(0))
  }

}
