package graft

import graft.operators.Chunker
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SentenceChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks(text: String, budget: Int): Seq[(Long, Long, Long)] =
    Chunker.sentenceChunks(Seq((1L, text)).toDF("id", "text"), col("text"), budget)
      .select("chunk_idx", "n_sentences", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("greedy packing: new chunk exactly when budget would be exceeded") {
    // sentences of 3, 3, 3, 3 tokens; budget 7 → [3+3], [3+3]
    val t = "a b c. d e f! g h i? j k l."
    assert(chunks(t, 7) == Seq((1L, 2L, 6L), (2L, 2L, 6L)))
    // budget 6: exact fit keeps two per chunk (strict >)
    assert(chunks(t, 6) == Seq((1L, 2L, 6L), (2L, 2L, 6L)))
    // budget 5: one per chunk
    assert(chunks(t, 5) == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 1L, 3L)))
  }

  test("over-budget sentence forms its own chunk, never splits") {
    val t = "one two three four five six. a b."
    assert(chunks(t, 4) == Seq((1L, 1L, 6L), (2L, 1L, 2L)))
    // and it closes the previous chunk first
    val t2 = "a b. one two three four five six. c d."
    assert(chunks(t2, 4) == Seq((1L, 1L, 2L), (2L, 1L, 6L), (3L, 1L, 2L)))
  }

  test("terminator runs and missing final terminator") {
    val t = "wow!! really?! yes"
    assert(chunks(t, 100) == Seq((1L, 3L, 3L)))
  }

  test("no terminators: whole doc is one sentence, one chunk") {
    assert(chunks("a b c d e", 2) == Seq((1L, 1L, 5L)))
  }

  test("empty and terminator-only text produce no chunks") {
    assert(chunks("", 5).isEmpty)
    assert(chunks("...", 5).isEmpty)
  }

  test("carried columns named pos/col do not become ambiguous") {
    val df = Seq((7L, 3, "u", "x. y. z.")).toDF("id", "pos", "col", "text")
    val out = Chunker.sentenceChunks(df, col("text"), 1)
    assert(out.count() == 3)
    assert(out.select("pos").as[Int].collect().toSet == Set(3))
  }

  test("reserved output names on the input fail fast") {
    val df = Seq((1L, 2L, "a. b.")).toDF("id", "chunk_idx", "text")
    assertThrows[IllegalArgumentException] {
      Chunker.sentenceChunks(df, col("text"), 5)
    }
  }

  test("id columns carried through the fan-out") {
    val df = Seq((7L, "x. y. z.")).toDF("id", "text")
    val out = Chunker.sentenceChunks(df, col("text"), 1)
    assert(out.columns.toSeq ==
      Seq("id", "text", "chunk_idx", "n_sentences", "n_tokens"))
    assert(out.select("id").as[Long].collect().toSet == Set(7L))
    assert(out.count() == 3)
  }
}
