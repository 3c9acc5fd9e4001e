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

    // k-anonymity uniqueness audit (Sweeney 2002): every customer row
    // gains its equivalence-class size over the quasi-identifiers
    // (nation, segment, account-balance band) and a suppression flag for
    // singleton classes — the pre-release re-identification check. k=2
    // keeps both verdicts live at every calibration scale; the oracle is
    // one partition-count window.
    "q217_k_anonymity" -> ((s, dir) => {
      import graft.operators.TableOps
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      TableOps.kAnonymity(base,
          Seq(col("c_nationkey"), col("c_mktsegment"), col("bal_band")), k = 2)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("bal_band"), col("group_size"), col("suppressed"))
    }),

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

    // Exact percentiles (engine capability beyond the reference — the
    // quality-threshold analytics a training pipeline runs on its metrics).
    "q61_percentiles" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
          round(expr("percentile(l_quantity, 0.99)"), 4).as("p99"))
    }),

    // §3.1 LINKS plan construction: (topic × search_type) fan-out with
    // round-robin provider assignment (itertools.cycle analog), filtered
    // query templating with site + time suffixes (LINKS:561-640, 1218-1223).
    "q60_search_fanout" -> ((s, dir) => {
      val topics = Tables.load(s, dir, "part").filter(col("p_partkey") < 500)
      val types = { import s.implicits._; Seq("web", "video").toDF("search_type") }
      // Round-robin position by DENSE-KEY ARITHMETIC, not a global
      // row_number window (which moves the whole fan-out to one
      // partition): p_partkey is contiguous 0..N-1 (verified on the
      // driver-generated parquet at sf0.001/0.01/0.1 — min 0, count ==
      // distinct == max+1), and 'video' < 'web', so the (p_partkey,
      // search_type) rank is 2·p_partkey + {1,2} — a pure per-row
      // expression, zero exchanges. If the generator ever re-keys 1-based,
      // the oracle's ROW_NUMBER catches it as a hash mismatch.
      val fanned = topics.crossJoin(types)
        .withColumn("rn",
          (col("p_partkey") * 2 +
            when(col("search_type") === "video", 1).otherwise(2)).cast("int"))
        .withColumn("provider",
          element_at(typedLit(Seq("searchapi", "jina", "tavily")),
            (pmod(col("rn") - 1, lit(3)) + 1).cast("int")))
      fanned.select(
        col("p_partkey"), col("search_type"), col("rn"), col("provider"),
        concat(
          lit("\""), col("p_brand"), lit("\" AND \""), col("p_type"), lit("\""),
          when(col("search_type") === "video", lit(" site:douyin.com"))
            .otherwise(lit(" site:edu.cn")),
          lit(" after:2024-01-01 before:2024-06-30")).as("final_query"))
    }),

    // X10: distributed markdown report generation (format_survey_for_rag
    // composition), one report per institution row.
    "q59_markdown_report" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val nation = broadcast(Tables.load(s, dir, "nation"))
      val base = cust.join(nation, col("c_nationkey") === col("n_nationkey"))
        .withColumn("subject",
          when(pmod(col("c_custkey"), lit(3)) === 0, "公办")
            .when(pmod(col("c_custkey"), lit(3)) === 1, "民办")
            .otherwise("公办民营/民办公助"))
        .withColumn("puhui", pmod(col("c_custkey"), lit(2)) === 0)
        .withColumn("modes",
          when(pmod(col("c_custkey"), lit(2)) === 0,
            array(lit("全日托"), lit("计时托"))).otherwise(array(lit("半日托"))))
        .withColumn("cap", (pmod(col("c_custkey"), lit(200)) + 20).cast("int"))
        .withColumn("cur", pmod(col("c_custkey"), lit(250)).cast("int"))
      base.select(col("c_custkey"),
        graft.transform.SurveyTransform.institutionReport(
          col("c_name"), col("n_name"), col("subject"), col("puhui"),
          col("modes"), col("cap"), col("cur")).as("report"))
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
    "q217_k_anonymity" ->
      """WITH b AS (SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
           FROM customer)
         SELECT c_custkey, c_nationkey, c_mktsegment, bal_band,
           COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, bal_band)
             AS group_size,
           CAST(CASE WHEN COUNT(*) OVER (PARTITION BY c_nationkey,
               c_mktsegment, bal_band) < 2 THEN 1 ELSE 0 END AS INT)
             AS suppressed
         FROM b""",
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
         GROUP BY 1, 2""",
    "q61_percentiles" ->
      """SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90,
           ROUND(QUANTILE_CONT(l_quantity, 0.99), 4) AS p99
         FROM lineitem GROUP BY l_returnflag""",
    "q60_search_fanout" ->
      """WITH fanned AS (
           SELECT p_partkey, p_brand, p_type, search_type,
             ROW_NUMBER() OVER (ORDER BY p_partkey, search_type) AS rn
           FROM part, (SELECT UNNEST(['web','video']) AS search_type)
           WHERE p_partkey < 500)
         SELECT p_partkey, search_type, rn,
           (['searchapi','jina','tavily'])[((rn - 1) % 3) + 1] AS provider,
           '"' || p_brand || '" AND "' || p_type || '"' ||
             (CASE WHEN search_type = 'video' THEN ' site:douyin.com'
                   ELSE ' site:edu.cn' END) ||
             ' after:2024-01-01 before:2024-06-30' AS final_query
         FROM fanned""",
    "q59_markdown_report" ->
      """WITH base AS (
           SELECT c_custkey, c_name, n_name,
             CASE c_custkey % 3 WHEN 0 THEN '公办' WHEN 1 THEN '民办'
               ELSE '公办民营/民办公助' END AS subject,
             (c_custkey % 2 = 0) AS puhui,
             CASE WHEN c_custkey % 2 = 0 THEN '全日托、计时托' ELSE '半日托' END AS modes,
             CAST(c_custkey % 200 + 20 AS INTEGER) AS cap,
             CAST(c_custkey % 250 AS INTEGER) AS cur
           FROM customer JOIN nation ON c_nationkey = n_nationkey)
         SELECT c_custkey,
           '# 机构调研报告' || chr(10) || chr(10) ||
           '## ' || c_name || '（' || n_name || '）' || chr(10) || chr(10) ||
           '| 项目 | 值 |' || chr(10) || '| --- | --- |' || chr(10) ||
           '| 办学性质 | ' || subject || ' |' || chr(10) ||
           '| 是否普惠 | ' || (CASE WHEN puhui THEN '是' ELSE '否' END) || ' |' || chr(10) ||
           '| 服务模式 | ' || modes || ' |' || chr(10) ||
           '| 核定规模 | ' || cap || '人 |' || chr(10) ||
           '| 在托人数 | ' || cur || '人 |' || chr(10) ||
           chr(10) ||
           (CASE WHEN cur > cap THEN '> 注意：在托人数超出核定规模' || chr(10) ELSE '' END)
           AS report
         FROM base""")
}
