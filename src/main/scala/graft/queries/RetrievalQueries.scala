package graft.queries

import graft.core.Tables
import graft.retrieval.Retrieval
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship retrieval-engine pipeline (SURVEY.md §3.3) as oracle-checked
  * queries: task distribution with global dedup (J4/J5/W2), metadata
  * enrichment with source precedence (J1/A9), nested output assembly (A3),
  * and the full recall→RRF→distribute→enrich composition.
  *
  * Chunks are modeled over `documents` (database_id=lang, document_id=
  * source) and recall lists over `events` (one ranked list per event_type),
  * so every stage is reproducible in the DuckDB oracle.
  */
object RetrievalQueries {

  private def chunks(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id").as("chunk_id"),
      col("lang").as("database_id"),
      col("source").as("document_id"),
      pmod(col("doc_id") * 37, lit(101)).as("score"))

  private def tasks(s: SparkSession, dir: String): DataFrame = {
    // task_order only ever feeds an ORDER BY (precedence in distribute),
    // so it is an order-isomorphic SORTABLE STRING built per-row — "0:" +
    // lang + ":" + source for segment tasks, "1:" + lang for full tasks —
    // which reproduces the old global row_number ordering (seg before
    // full, then lang, then source) with ZERO exchanges instead of an
    // unpartitioned window that serialized the dimension through one task.
    val docs = Tables.load(s, dir, "documents")
    val seg = docs.filter(col("source").isin("src0", "src1"))
      .select(col("lang"), col("source")).distinct()
      .select(
        concat(col("lang"), lit(":"), col("source")).as("task_id"),
        col("lang").as("database_id"), col("source").as("document_id"),
        lit("segment_retrieval").as("retrieval_mode"),
        concat(lit("0:"), col("lang"), lit(":"), col("source")).as("task_order"),
        lit(3).as("top_k"))
    val full = docs.select(col("lang")).distinct()
      .select(
        concat(lit("full:"), col("lang")).as("task_id"),
        col("lang").as("database_id"),
        lit(null).cast("string").as("document_id"),
        lit("full_database_retrieval").as("retrieval_mode"),
        concat(lit("1:"), col("lang")).as("task_order"),
        lit(5).as("top_k"))
    seg.unionByName(full)
  }

  private def meta(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.load(s, dir, "documents")
      .select(col("lang").as("database_id"), col("source").as("document_id")).distinct()
    val api = dims.filter(col("document_id").isin("src0", "src1", "src2"))
      .withColumn("meta_source", lit("api_detail"))
    val snap = dims.withColumn("meta_source", lit("retrieve_snapshot"))
    api.unionByName(snap)
      .withColumn("title",
        concat(when(col("meta_source") === "api_detail", "D:").otherwise("S:"),
          col("database_id"), lit("/"), col("document_id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J4/J5/W2: task fan-out, earliest-task-wins dedup, per-task top-k.
    "q48_task_distribution" -> ((s, dir) => {
      Retrieval.distribute(chunks(s, dir), tasks(s, dir))
        .select(col("task_id"), col("chunk_id"), col("score"), col("rnk"))
    }),

    // J1/A9: precedence-deduped broadcast enrichment.
    "q49_meta_enrich" -> ((s, dir) => {
      Retrieval.enrich(chunks(s, dir), meta(s, dir))
        .select(col("chunk_id"), col("database_id"), col("document_id"),
          col("meta_source"), col("title"))
    }),

    // A3: nested db → doc → ordered-blocks assembly, rendered as strings.
    "q51_nested_assembly" -> ((s, dir) => {
      Retrieval.assembleNested(
        chunks(s, dir).withColumn("position", col("chunk_id")))
    }),

    // X8's deterministic half made REAL: inverted-index lexical rerank
    // (length-normalized TF×rarity), top-5 per query. Contributions are
    // decimal-cast before summing, so the oracle reproduces every score.
    "q88_rerank_lexical" -> ((s, dir) => {
      import s.implicits._
      val queriesDf = Seq(
        (1L, "spark window filter"),
        (2L, "vector merge customer"),
        (3L, "hash scan stream order")).toDF("query_id", "query_text")
      Retrieval.rerankLexical(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        queriesDf, "query_id", "query_text", k = 5)
    }),

    // Full pipeline: recall lists per event_type → RRF → distribute → enrich.
    "q50_retrieval_pipeline" -> ((s, dir) => {
      val recall = Tables.load(s, dir, "events")
        .groupBy(col("event_type").as("query_id"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("score"))
        .select(col("query_id"), col("user_id").as("chunk_id"),
          concat(lit("db"), pmod(col("chunk_id"), lit(3))).as("database_id"),
          concat(lit("doc"), pmod(col("chunk_id"), lit(10))).as("document_id"),
          col("chunk_id").as("position"), col("score"))
      import s.implicits._
      val tasksDf = Seq("db0", "db1", "db2").zipWithIndex
        .map { case (db, i) => (s"full:$db", db, i + 1) }
        .toDF("task_id", "database_id", "task_order")
        .withColumn("document_id", lit(null).cast("string"))
        .withColumn("retrieval_mode", lit("full_database_retrieval"))
        .withColumn("top_k", lit(8))
      val metaDf = (for (db <- 0 to 2; doc <- 0 to 9) yield
          (s"db$db", s"doc$doc", "api_detail", s"T:db$db/doc$doc"))
        .toDF("database_id", "document_id", "meta_source", "title")
      Retrieval.pipeline(recall, tasksDf, metaDf, topK = 8)
        .select(col("task_id"), col("chunk_id"), col("rnk"),
          round(col("score"), 6).as("rrf"), col("title"))
    }))

  private val chunksSql =
    "SELECT doc_id AS chunk_id, lang AS database_id, source AS document_id, (doc_id*37)%101 AS score FROM documents"

  private val tasksSql =
    """SELECT lang || ':' || source AS task_id, lang AS database_id, source AS document_id,
         'segment_retrieval' AS retrieval_mode,
         ROW_NUMBER() OVER (ORDER BY lang, source) AS task_order, 3 AS top_k
       FROM (SELECT DISTINCT lang, source FROM documents WHERE source IN ('src0','src1'))
       UNION ALL
       SELECT 'full:' || lang, lang, NULL, 'full_database_retrieval',
         100 + ROW_NUMBER() OVER (ORDER BY lang), 5
       FROM (SELECT DISTINCT lang FROM documents)"""

  private val metaSql =
    """WITH dims AS (SELECT DISTINCT lang AS database_id, source AS document_id FROM documents)
       SELECT database_id, document_id, 'api_detail' AS meta_source,
         'D:' || database_id || '/' || document_id AS title
       FROM dims WHERE document_id IN ('src0','src1','src2')
       UNION ALL
       SELECT database_id, document_id, 'retrieve_snapshot',
         'S:' || database_id || '/' || document_id
       FROM dims"""

  val oracles: Map[String, String] = Map(
    "q88_rerank_lexical" ->
      """WITH toks AS (SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
           FROM documents),
         dl AS (SELECT doc_id, len(toks) AS len FROM toks),
         post AS (SELECT doc_id, unnest(toks) AS term FROM toks),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM post GROUP BY 1, 2),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         q(query_id, term) AS (VALUES
           (1, 'spark'), (1, 'window'), (1, 'filter'),
           (2, 'vector'), (2, 'merge'), (2, 'customer'),
           (3, 'hash'), (3, 'scan'), (3, 'stream'), (3, 'order')),
         c AS (SELECT q.query_id, tf.doc_id,
             CAST(CAST(tf.tf * n.n_docs AS DOUBLE) /
                  CAST(df.df * (dl.len + 1) AS DOUBLE) AS DECIMAL(18,9)) AS c
           FROM q JOIN tf USING (term) JOIN df USING (term)
             JOIN dl ON tf.doc_id = dl.doc_id, n),
         s AS (SELECT query_id, doc_id, CAST(SUM(c) AS DOUBLE) AS score
           FROM c GROUP BY 1, 2),
         r AS (SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rnk
           FROM s)
         SELECT query_id, doc_id, rnk, ROUND(score, 6) AS score
         FROM r WHERE rnk <= 5""",
    "q48_task_distribution" ->
      s"""WITH chunks AS ($chunksSql),
         tasks AS ($tasksSql),
         j AS (SELECT c.chunk_id, c.score, t.task_id, t.task_order, t.top_k
           FROM chunks c JOIN tasks t ON c.database_id = t.database_id
             AND (t.retrieval_mode = 'full_database_retrieval' OR c.document_id = t.document_id)),
         owned AS (SELECT * FROM j QUALIFY
           ROW_NUMBER() OVER (PARTITION BY chunk_id ORDER BY task_order, task_id) = 1),
         ranked AS (SELECT task_id, chunk_id, score,
             ROW_NUMBER() OVER (PARTITION BY task_id ORDER BY score DESC, chunk_id) AS rnk,
             top_k
           FROM owned)
         SELECT task_id, chunk_id, score, rnk FROM ranked WHERE rnk <= top_k""",
    "q49_meta_enrich" ->
      s"""WITH chunks AS ($chunksSql),
         meta AS ($metaSql),
         best AS (SELECT * FROM meta QUALIFY ROW_NUMBER() OVER (
           PARTITION BY database_id, document_id
           ORDER BY CASE WHEN meta_source = 'api_detail' THEN 0 ELSE 1 END, meta_source) = 1)
         SELECT chunk_id, c.database_id, c.document_id, meta_source, title
         FROM chunks c LEFT JOIN best b
           ON c.database_id = b.database_id AND c.document_id = b.document_id""",
    "q51_nested_assembly" ->
      s"""WITH chunks AS ($chunksSql),
         docs_level AS (
           SELECT database_id, document_id,
             STRING_AGG(chunk_id, ',' ORDER BY chunk_id, chunk_id) AS block_ids,
             COUNT(*) AS n_blocks
           FROM chunks GROUP BY database_id, document_id)
         SELECT database_id,
           STRING_AGG(document_id || ':' || block_ids, ';' ORDER BY document_id, block_ids) AS docs,
           CAST(SUM(n_blocks) AS BIGINT) AS n_chunks
         FROM docs_level GROUP BY database_id""",
    "q50_retrieval_pipeline" ->
      """WITH recall AS (
           SELECT event_type AS query_id, user_id AS chunk_id,
             'db' || (user_id % 3) AS database_id,
             'doc' || (user_id % 10) AS document_id,
             user_id AS position,
             SUM(CAST(value AS DECIMAL(18,2))) AS score
           FROM events GROUP BY 1, 2, 3, 4, 5),
         ranked AS (SELECT query_id, chunk_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, chunk_id) AS r
           FROM recall),
         fused AS (SELECT chunk_id,
             SUM(CAST(1 AS DOUBLE) / (60 + r)) AS score
           FROM ranked GROUP BY chunk_id),
         scored AS (SELECT DISTINCT rc.chunk_id, rc.database_id, rc.document_id, f.score
           FROM recall rc JOIN fused f ON rc.chunk_id = f.chunk_id),
         tasks(task_id, database_id, task_order) AS (VALUES
           ('full:db0', 'db0', 1), ('full:db1', 'db1', 2), ('full:db2', 'db2', 3)),
         j AS (SELECT s.chunk_id, s.score, t.task_id, t.task_order, s.database_id, s.document_id
           FROM scored s JOIN tasks t ON s.database_id = t.database_id),
         owned AS (SELECT * FROM j QUALIFY
           ROW_NUMBER() OVER (PARTITION BY chunk_id ORDER BY task_order, task_id) = 1),
         dist AS (SELECT task_id, chunk_id, database_id, document_id, score,
             ROW_NUMBER() OVER (PARTITION BY task_id ORDER BY score DESC, chunk_id) AS rnk
           FROM owned)
         SELECT task_id, chunk_id, rnk, ROUND(score, 6) AS rrf,
           'T:' || database_id || '/' || document_id AS title
         FROM dist WHERE rnk <= 8""")
}
