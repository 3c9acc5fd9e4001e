package graft

import graft.functions.CdcChunks
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gear-CDC kernel: boundary determinism, size bounds, and the property
  * the whole operator exists for — insertions only re-cut chunks up to
  * the next content-defined boundary (q205 carries it on the oracle
  * surface; this spec pins it structurally).
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks(
      text: String, min: Int = 32, max: Int = 256, bits: Int = 6): Seq[(Int, Int, Long)] =
    Seq(text).toDF("t")
      .select(CdcChunks.expr(col("t"), min, max, bits).as("c"))
      .head().getAs[scala.collection.Seq[Row]]("c")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq

  private val rnd = new scala.util.Random(42)
  private val base = (1 to 400)
    .map(_ => ('a' + rnd.nextInt(26)).toChar.toString + " ").mkString

  test("chunks tile the text exactly; sizes respect [min, max]") {
    val cs = chunks(base)
    assert(cs.nonEmpty)
    assert(cs.head._1 == 1)
    cs.sliding(2).foreach {
      case Seq((s1, l1, _), (s2, _, _)) => assert(s2 == s1 + l1)
      case _ =>
    }
    assert(cs.map(_._2).sum == base.length)
    // every chunk except possibly the tail respects the bounds
    cs.init.foreach { case (_, l, _) => assert(l >= 32 && l <= 256) }
    assert(cs.last._2 <= 256)
  }

  test("deterministic, and chunk hashes equal the poly31 fold of the slice") {
    val cs1 = chunks(base)
    assert(cs1 == chunks(base))
    cs1.foreach { case (s, l, h) =>
      val slice = base.substring(s - 1, s - 1 + l)
      val ph = slice.codePoints().toArray
        .foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      assert(h == ph, s"chunk at $s")
    }
  }

  test("insertion shifts only the chunks before the next boundary (CDC property)") {
    val shifted = "INJECTED PREFIX OF ODD LENGTH 123 " + base
    val h1 = chunks(base).map(_._3).toSet
    val h2 = chunks(shifted).map(_._3).toSet
    // a fixed-width chunker would share ZERO chunks after a 34-char
    // shift; CDC re-syncs at the first content boundary
    val shared = h1.intersect(h2).size
    assert(shared >= h1.size - 2, s"shared=$shared of ${h1.size}")
    // mid-document edit: chunks before AND after the edit survive
    val edited = base.substring(0, 200) + "EDIT" + base.substring(200)
    val h3 = chunks(edited).map(_._3).toSet
    assert(h1.intersect(h3).size >= h1.size - 3)
  }

  test("maxSize forces a cut on boundary-free content; empty text -> no chunks") {
    // a constant string never hits the gear mask? not guaranteed — but
    // whatever happens, no chunk may exceed maxSize
    val flat = "x" * 1000
    val cs = chunks(flat, min = 32, max = 64, bits = 20) // mask rarely hits
    assert(cs.forall(_._2 <= 64))
    assert(cs.map(_._2).sum == 1000)
    assert(chunks("").isEmpty)
    // minSize suppresses boundaries below 300 chars: with maskBits=1
    // (a boundary every ~2 chars otherwise) every non-tail chunk must
    // still reach minSize exactly
    val cs300 = chunks(base, min = 300, max = 400, bits = 1)
    assert(cs300.init.forall(_._2 >= 300))
    assert(cs300.map(_._2).sum == base.length)
  }
}
