package graft.retrieval

import graft.operators.{Ranking, Rrf}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship retrieval pipeline (SURVEY.md §3.3,
  * retrieve.py): recall lists → RRF fusion → (rerank) → task distribution
  * with global dedup and per-task top-k → metadata enrichment → nested
  * output assembly.
  *
  * Scale notes: chunks shuffle once on chunk id for dedup, once on task id
  * for the top-k window; metadata is always broadcast (dimension-sized);
  * the nested assembly is the only collect_list and it groups by document,
  * which bounds per-group size to a document's chunk count.
  *
  * Sequential-order semantics (retrieve.py:372-387 `used_chunk_ids`) are
  * reproduced with an explicit `task_order` column and a keep-first window:
  * each chunk belongs to the EARLIEST task that requests it, then tasks
  * slice their top-k. (Declared divergence, SURVEY.md §7: the reference's
  * recursive take-then-exclude loop is order-dependent; this declarative
  * form is deterministic and equivalent whenever earlier tasks' top-k caps
  * don't overflow — the reference's own fixtures never overflow.)
  */
object Retrieval {

  /** Task table contract (FIXTURES.md §4): task_id, database_id,
    * document_id (null for full-DB tasks), retrieval_mode
    * ∈ {segment_retrieval, full_database_retrieval}, task_order, top_k.
    */
  def distribute(
      chunks: DataFrame,   // chunk_id, database_id, document_id, score
      tasks: DataFrame,
      defaultTopK: Int = 20): DataFrame = {
    val joined = chunks.join(
      tasks,
      chunks("database_id") === tasks("database_id") && (
        tasks("retrieval_mode") === "full_database_retrieval" ||
          chunks("document_id") === tasks("document_id")))
      .select(chunks("chunk_id"), chunks("database_id"), chunks("document_id"),
        chunks("score"), tasks("task_id"), tasks("task_order"),
        coalesce(tasks("top_k"), lit(defaultTopK)).as("top_k"))
    // J5 global dedup: earliest task wins the chunk.
    val owned = Ranking.keepFirst(joined, Seq(col("chunk_id")),
      Seq(col("task_order").asc, col("task_id").asc))
    // W2 top-k per task.
    val w = Window.partitionBy(col("task_id"))
      .orderBy(col("score").desc, col("chunk_id").asc)
    owned.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("top_k"))
  }

  /** Scan sharing (SURVEY.md §4 row 1, retrieve.py:276-314
    * `build_execution_plan`): same-database segment tasks merge into ONE
    * job carrying an OR'd document filter; any full-DB task for that
    * database subsumes them all into a single unfiltered scan. N tasks →
    * ≤1 scan per database instead of N scans.
    *
    * Output: one job row per database —
    *   (database_id, full_scan: boolean, doc_ids: array<string> or null,
    *    task_ids: sorted array).
    */
  def buildExecutionPlan(tasks: DataFrame): DataFrame =
    tasks
      .groupBy(col("database_id"))
      .agg(
        max(when(col("retrieval_mode") === "full_database_retrieval", true)
          .otherwise(false)).as("full_scan"),
        sort_array(collect_set(when(
          col("retrieval_mode") =!= "full_database_retrieval",
          col("document_id")))).as("seg_docs"),
        sort_array(collect_set(col("task_id"))).as("task_ids"))
      .withColumn("doc_ids",
        when(col("full_scan"), lit(null).cast("array<string>"))
          .otherwise(col("seg_docs")))
      .drop("seg_docs")

  /** Apply a job plan to the chunk store: one filtered scan per job —
    * `doc_ids IS NULL` (full scan) or membership filter, which Catalyst
    * pushes to the source as an IN list.
    */
  def scanWithPlan(chunks: DataFrame, jobs: DataFrame): DataFrame =
    chunks.join(broadcast(jobs), Seq("database_id"))
      .filter(col("doc_ids").isNull ||
        array_contains(col("doc_ids"), col("document_id")))

  /** J1 metadata enrichment with A9 source precedence: `api_detail` beats
    * `retrieve_snapshot` per (database_id, document_id); broadcast left join
    * (retrieve.py:239-333).
    */
  def enrich(chunks: DataFrame, meta: DataFrame): DataFrame = {
    val precedence = when(col("meta_source") === "api_detail", 0).otherwise(1)
    val best = Ranking.keepFirst(meta,
      Seq(col("database_id"), col("document_id")),
      Seq(precedence.asc, col("meta_source").asc))
    chunks.join(broadcast(best), Seq("database_id", "document_id"), "left")
  }

  /** A3 nested regrouping: chunks → db → [doc → [position-ordered blocks]],
    * rendered deterministically (sorted structs → strings) so batch output
    * is hash-comparable.
    */
  def assembleNested(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("database_id"), col("document_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("position"), col("chunk_id")))),
          x => x.getField("chunk_id").cast("string")), ",").as("block_ids"),
        count(lit(1)).as("n_blocks"))
      .groupBy(col("database_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("document_id"), col("block_ids")))),
          x => concat(x.getField("document_id"), lit(":"), x.getField("block_ids"))),
          ";").as("docs"),
        sum(col("n_blocks")).as("n_chunks"))

  /** X8 rerank stub: deterministic stand-in for the external cross-encoder
    * (BAAI/bge-reranker-v2-m3, retrieve.py:183-232). Real deployments
    * replace `stubScore` with a batched model call in mapPartitions; the
    * fallback rule (keep fused order on failure, retrieve.py:229-232) is
    * the `coalesce`.
    */
  def rerank(fused: DataFrame, queryText: Column, content: Column,
      fusedScore: Column): DataFrame = {
    val stubScore = pmod(xxhash64(concat(queryText, lit("\u0000"), content)), lit(1000)) / 1000.0
    fused.withColumn("rerank_score", coalesce(stubScore, fusedScore))
  }

  /** Cross-encoder model seam for [[rerankBatched]]: one call scores ONE
    * query against ≤ batchSize documents (the reference's HTTP rerank
    * endpoint shape, retrieve.py:196-203). Throwing signals failure; the
    * caller applies the reference's fallback. Implementations must be
    * serializable — they run inside mapGroups on executors.
    */
  trait RerankModel extends Serializable {
    /** @return one relevance score per doc, aligned by index. */
    def score(query: String, docs: Seq[String]): Seq[Double]
  }

  /** The reference's batched rerank execution contract
    * (retrieve.py:183-232), as real distributed machinery around the model
    * seam:
    *
    *  - per query, candidates are taken in FUSED order and capped at
    *    `batchSize` (`chunks[:100]`) — one model call per query, never
    *    more than `batchSize` docs per call;
    *  - model scores replace fused scores, rounded to 4 decimals
    *    (`round(new_score, 4)`);
    *  - a model failure falls back to the ORIGINAL candidate list with its
    *    fused scores and order — ALL candidates, uncapped
    *    (retrieve.py:229-232's "keep RRF results" degrade path).
    *
    * Grouping runs as `groupByKey(query_id).flatMapGroups`: per-group
    * state is one query's candidate list, bounded by the upstream fusion
    * top-k, so executor memory is safe at any corpus scale; queries
    * parallelize across the shuffle.
    *
    * @param fused columns: query_id (long), query_text, chunk_id,
    *              content, fused_rank (int, 1-based fused order),
    *              fused_score (double)
    * @return (query_id, chunk_id, fused_rank, rerank_score, reranked)
    */
  def rerankBatched(fused: DataFrame, model: RerankModel,
      batchSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("chunk_id", StringType, nullable = false),
      StructField("fused_rank", IntegerType, nullable = false),
      StructField("rerank_score", DoubleType, nullable = false),
      StructField("reranked", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val keyEnc = org.apache.spark.sql.Encoders.scalaLong
    fused
      .select(col("query_id").cast("long"), col("query_text"), col("chunk_id"),
        col("content"), col("fused_rank").cast("int"),
        col("fused_score").cast("double"))
      .groupByKey(_.getLong(0))(keyEnc)
      .flatMapGroups { (qid, it) =>
        val rows = it.toArray.sortBy(_.getInt(4)) // fused order
        val capped = rows.take(batchSize)
        try {
          val scores = model.score(
            capped.head.getString(1), capped.map(_.getString(3)).toSeq)
          require(scores.length == capped.length,
            s"model returned ${scores.length} scores for ${capped.length} docs")
          capped.iterator.zip(scores.iterator).map { case (r, s) =>
            Row(qid, r.getString(2), r.getInt(4),
              math.rint(s * 10000) / 10000.0, true)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            // degrade: the FULL original list, fused scores, fused order
            rows.iterator.map(r =>
              Row(qid, r.getString(2), r.getInt(4), r.getDouble(5), false))
        }
      }(enc)
  }

  /** REAL lexical reranker (the deterministic half of X8 — the model seam
    * above stays for cross-encoder deployments): length-normalized
    * TF×rarity scoring through an INVERTED INDEX join, never a
    * query×corpus cross join —
    *
    *   score(q, d) = Σ_{t ∈ distinct terms of q}  tf(t,d) · N / (df(t) · (1 + len_d))
    *
    * Per-term contributions are cast to DECIMAL(18,9) before the sum, so
    * the aggregate is partition-order-invariant (double addition is not
    * associative) — the q88 oracle reproduces every score exactly. A
    * broadcast semi-join on the query-term set gates the exploded tokens
    * BEFORE any aggregation, so every shuffle carries query-term postings
    * only (tf, df and len restricted to query terms equal their
    * corpus-wide values); the query terms, df and N are dimension-bounded
    * broadcasts. Docs sharing no term score 0 and are
    * simply absent (the candidate-generation stage upstream owns recall).
    *
    * @param queries (queryId, queryText) — small, broadcast
    */
  def rerankLexical(
      docs: DataFrame, docId: String, textCol: String,
      queries: DataFrame, queryId: String, queryText: String,
      k: Int): DataFrame = {
    import graft.functions.TextFunctions
    val terms = queries.select(col(queryId).as("query_id"),
      explode(array_distinct(TextFunctions.tokens(col(queryText)))).as("term"))
    val termSet = terms.select(col("term")).distinct()
    // The broadcast query-term filter runs BEFORE any aggregation, so
    // every exchange downstream carries query-term postings only — never
    // a corpus-wide (doc, term) index or a corpus-wide docLen join. df(t)
    // and tf(t,d) restricted to query terms are unchanged by the filter
    // (both are per-term counts), and len_d rides the explode as a
    // carried column (functionally dependent on doc_id, folded with
    // max()), so the only corpus-wide work left is the narrow token scan
    // and the 1-row n_docs count.
    val toks = docs.select(col(docId).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val hits = toks
      .select(col("doc_id"), size(col("toks")).as("len"),
        explode(col("toks")).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
    val postings = hits
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val contrib = broadcast(terms)
      .join(postings, Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("c",
        ((col("tf") * col("n_docs")).cast("double") /
          (col("df") * (col("len") + 1)).cast("double")).cast("decimal(18,9)"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).cast("double").as("score"))
    Ranking.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("doc_id").asc), k, rankCol = Some("rnk"))
      .select(col("query_id"), col("doc_id"), col("rnk"),
        round(col("score"), 6).as("score"))
  }

  /** Full pipeline: per-list ranked recall → RRF → distribution → enrich. */
  def pipeline(
      recall: DataFrame,    // query_id, chunk_id, database_id, document_id, position, score
      tasks: DataFrame,
      meta: DataFrame,
      rrfK: Int = Rrf.DefaultK,
      topK: Int = 20): DataFrame = {
    val fused = Rrf.fuse(recall, col("query_id"), col("chunk_id"), col("score"),
        rrfK, col("chunk_id"))
      .withColumnRenamed("item", "chunk_id")
    // deterministic representative per chunk (NOT dropDuplicates, which
    // keeps a partition-order-dependent row): first by query_id
    val scored = Ranking.keepFirst(recall,
        Seq(col("chunk_id")), Seq(col("query_id").asc))
      .drop("score", "query_id")
      .join(fused, Seq("chunk_id"))
      .withColumnRenamed("rrf_score", "score")
    val distributed = distribute(scored, tasks, topK)
    enrich(distributed, meta)
  }
}
