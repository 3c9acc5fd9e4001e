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

  /** Sentence-aware greedy chunking — the RAG chunker shape that respects
    * sentence boundaries instead of slicing mid-sentence: sentences
    * (terminator runs `[.!?]+` or end-of-text close a sentence) pack
    * greedily into chunks, starting a new chunk when adding the next
    * sentence would exceed `budgetTokens` (a single over-budget sentence
    * still forms its own chunk rather than being split).
    *
    * The whole computation is one narrow projection per row — sentence
    * split, per-sentence token counts, and the greedy fold all run inside
    * `transform`/`aggregate` HOFs, then `posexplode` fans chunks out.
    * ZERO exchanges at any scale; per-row state is bounded by the
    * document's own sentence count.
    *
    * @return one row per chunk: id columns + (chunk_idx 1-based,
    *   n_sentences, n_tokens)
    */
  def sentenceChunks(
      df: DataFrame, textCol: Column, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val reserved = Seq("chunk_idx", "n_sentences", "n_tokens", "__sc_chunks")
    require(!df.columns.exists(reserved.contains),
      s"input must not already carry ${reserved.mkString("/")}")
    val sents = graft.functions.TextFunctions.sentences(textCol)
    val cnts = transform(sents,
      x => size(graft.functions.TextFunctions.tokens(x)).cast("long"))
    // typed empty array<struct<ns,nt>> (cast from array<bigint> won't)
    val emptyState = slice(
      array(struct(lit(0L).as("ns"), lit(0L).as("nt"))), 1, 0)
    val folded = aggregate(cnts, emptyState, (acc, c) => {
      val last = element_at(acc, -1)
      val fresh = array(struct(lit(1L).as("ns"), c.as("nt")))
      when(size(acc) === 0, fresh)
        .when(last.getField("nt") + c > budgetTokens, concat(acc, fresh))
        .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
          array(struct((last.getField("ns") + 1).as("ns"),
            (last.getField("nt") + c).as("nt")))))
    })
    df.withColumn("__sc_chunks", folded)
      // unique generator output names: a carried 'pos'/'col' column must
      // not become an ambiguous reference
      .select(col("*"),
        posexplode(col("__sc_chunks")).as(Seq("__sc_pos", "__sc_chunk")))
      .select(df.columns.map(col) ++ Seq(
        (col("__sc_pos") + 1).cast("long").as("chunk_idx"),
        col("__sc_chunk.ns").as("n_sentences"),
        col("__sc_chunk.nt").as("n_tokens")): _*)
  }

  /** Section-aware hierarchical chunking of markdown-ish documents: every
    * `# ` / `## ` heading starts a new section, body lines carry their
    * heading PATH (h1, h2) — the structure-preserving splitter RAG and
    * pretraining pipelines run instead of blind fixed-width chunking, so
    * a chunk can always say where in the document it came from. An `## `
    * under a NEW `# ` does not leak the previous h1's subsection: the h2
    * binding carries the h1 ordinal it was seen under and goes null when
    * the scope changes. Lines before any heading form section 0 with
    * null headings.
    *
    * Scale posture: one posexplode + ONE doc-keyed window pass (running
    * sums + last-ignore-nulls over the same frame — a single partitioned
    * sort), then a doc+section hash agg whose collect is bounded by
    * section size, not document count. The window's exchange is the only
    * shuffle, and it vanishes when the input is already clustered by the
    * id column — Spark's planner proves the distribution and elides it
    * (receipt in SCALE.md: 0 shuffle bytes on a doc-partitioned
    * checkpoint vs 3.6 GB on scattered ids at 10M docs). On a bucketed
    * 100 TB corpus this operator runs shuffle-free.
    *
    * Output: (doc_id, section_id, h1, h2, n_lines, body) — body is the
    * non-heading lines rejoined with newlines in document order. A null
    * or empty document has NO lines and yields no rows — `split("")`
    * would otherwise fabricate one empty line and a phantom section 0
    * (split("", "\n") == [""], unlike an empty-array oracle unnest).
    * The empty guard rides INSIDE the generator as a null-producing
    * `when` (non-outer posexplode drops null arrays), and `textCol` is
    * lambda-bound first: a `where` clause would get pushed below the
    * projection and re-evaluate the caller's full text expression per
    * conjunct (3× a HOF render in q216's shape — measured).
    */
  def sectionChunks(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df.select(idCol.as("doc_id"),
      posexplode(graft.functions.TextFunctions.bindOnce(textCol)(t =>
        when(t.isNotNull && length(t) > 0, split(t, "\n"))))
        .as(Seq("pos", "line")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tagged = lines
      .withColumn("__t",
        when(col("line").startsWith("## "), 2)
          .when(col("line").startsWith("# "), 1).otherwise(0))
      .withColumn("section_id",
        sum(when(col("__t") > 0, 1).otherwise(0)).over(w))
      .withColumn("__h1cnt",
        sum(when(col("__t") === 1, 1).otherwise(0)).over(w))
    val tagged2 = tagged
      .withColumn("h1",
        last(when(col("__t") === 1,
          col("line").substr(lit(3), length(col("line")))),
          ignoreNulls = true).over(w))
      .withColumn("__h2s",
        last(when(col("__t") === 2,
          struct(col("__h1cnt").as("c"),
            col("line").substr(lit(4), length(col("line"))).as("t"))),
          ignoreNulls = true).over(w))
      .withColumn("h2",
        when(col("__h2s.c") === col("__h1cnt"), col("__h2s.t")))
    tagged2.groupBy(col("doc_id"), col("section_id"))
      .agg(max(col("h1")).as("h1"), max(col("h2")).as("h2"),
        count(when(col("__t") === 0, 1)).as("n_lines"),
        array_join(transform(
          array_sort(collect_list(when(col("__t") === 0,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("body"))
  }
}
