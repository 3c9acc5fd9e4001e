package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final coverage batch: embedding-cosine near-dup pairs (the remaining
  * dedup modality), BPE-ish sub-word tokenization, and batch sliding
  * windows (the streaming shape, oracle-checked in batch form).
  */
object ExtendedQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Embedding-cosine near-dup detection: exact pairwise over a bounded
    // id range (the LSH/IVF-blocked form is the scale path — q47).
    "q56_embedding_neardup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300)
      Similarity.cosinePairs(e, "vec_id", "embedding", threshold = 0.35)
    }),

    // BPE-ish sub-word tokens: letter runs / digit runs / single marks.
    "q57_bpeish_tokens" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("toks", TextFunctions.bpeishTokens(col("text")))
        .select(col("doc_id"),
          size(col("toks")).as("n_subtokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
    }),

    // Sliding windows (3h width, 1h slide) in batch form — each event lands
    // in three hourly-aligned windows.
    "q58_sliding_windows" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "3 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"))
    }))

  val oracles: Map[String, String] = Map(
    "q56_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 300)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 4) AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.v, b.v) >= 0.35""",
    "q57_bpeish_tokens" ->
      """SELECT doc_id,
           LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens,
           LEN(LIST_DISTINCT(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS n_distinct
         FROM documents""",
    "q58_sliding_windows" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts) - k * INTERVAL 1 HOUR,
             '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n
         FROM events, RANGE(0, 3) t(k)
         GROUP BY 1, 2""")
}
