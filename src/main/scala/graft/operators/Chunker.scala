package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — the engine's form of the reference RAG pipeline's
  * chunker node (托育行业调研数据采集.pipeline: datasource → extractor →
  * CHUNKER → KB index): split each document into fixed-size character
  * windows with overlap, deterministically.
  *
  * Offsets are `i·stride` (stride = size − overlap) for
  * i ∈ [0, ceil((len − size)/stride)] clamped at 0, so the final chunk
  * always covers the tail and a short document yields exactly one chunk.
  * Pure generator over a narrow projection — no shuffle at any scale; the
  * fan-out multiplies rows by ~len/stride, which downstream operators see
  * as ordinary data growth.
  */
object Chunker {

  /** Adds `chunk_idx` (0-based) and `chunk`; one output row per chunk. */
  def fixedChunks(
      df: DataFrame, textCol: Column, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size (got size=$size overlap=$overlap)")
    val stride = size - overlap
    // floor((len - size + stride - 1) / stride), clamped at 0 — floor
    // division matches the oracle's `//` exactly (ints are < 2^52, so the
    // double round-trip is lossless)
    val k = greatest(lit(0L),
      floor((length(textCol) - size + (stride - 1)) / lit(stride)).cast("long"))
    df.withColumn("chunk_idx", explode(sequence(lit(0L), k)))
      .withColumn("chunk",
        textCol.substr(col("chunk_idx").cast("int") * stride + 1, lit(size)))
  }
}
