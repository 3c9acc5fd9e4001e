package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Mixture, QualityRules, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q134 — the r5 corpus-curation stages composed into ONE end-to-end
  * pipeline, oracle-checked through every stage boundary:
  *
  *   WARC shards → HTTP-status filter → robots.txt gate (RFC 9309,
  *   agent-group selection + wildcard rules) → per-registrable-domain
  *   quota → Gopher quality rules → corpus-level boilerplate-line removal
  *   → MinHash-LSH near-duplicate removal → temperature-scaled language
  *   mixture.
  *
  * The pieces are the SAME operators q112/q120/q118/q113/q121/q86/q117
  * check individually; this query certifies their integration seams — the
  * value handed across each boundary (URL fields parsed out of WARC
  * target URIs, the robots verdict, the quota pick, cleaned text feeding
  * the shingle layer) is what the next stage consumes, and the DuckDB
  * oracle replays the WHOLE chain in one WITH-RECURSIVE program, so the
  * final 5-row mixture hash certifies every intermediate set.
  *
  * Stage-boundary shuffle audit (PLANS.md `q134`): the only exchanges are
  * the ones the stages THEMSELVES own — the WARC fixture groupBy, the
  * per-domain quota window, line-removal's frequency agg + regroup, the
  * LSH band join + component loop, and the final mixture agg. Every gate
  * between them (status, robots, Gopher) is a narrow filter or broadcast
  * join: robots rules broadcast (dimension-sized), the Gopher gate is the
  * per-row [[QualityRules.keepFlag]] predicate (no join against the
  * signal query), and `lang` rides [[Dedup.removeBoilerplateLines]]'s
  * carry seam instead of a re-join.
  */
object PipelineQueries {

  /** Per-domain quota for the curation pipeline (binds on sf0.01's ~14
    * post-gate docs per domain).
    */
  private val DomainCap = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q134_curation_pipeline" -> ((s, dir) => {
      import graft.sources.{Robots, Warc}

      // ---- stage 0: WARC shards (q112 shape; the URL carries the
      // crawl metadata downstream stages parse back out: host = the
      // registrable domain, first path segment = lang, trailing digits =
      // doc id; doc_id % 11 == 0 rows ship as 404s the status gate drops)
      val d0 = Tables.load(s, dir, "documents").filter(col("doc_id") < 400)
      val sub = pmod(col("doc_id"), lit(5))
      val m = pmod(col("doc_id"), lit(20))
      val path = concat(lit("/"), col("lang"),
        when(sub === 0, concat(lit("/private/x"), col("doc_id")))
          .when(sub === 1, concat(lit("/private/pub/"), col("doc_id")))
          .when(sub === 2, concat(lit("/tmp/doc"), col("doc_id")))
          .when(sub === 3, concat(lit("/keep/doc"), col("doc_id")))
          .otherwise(concat(lit("/ok"), col("doc_id"))))
      val params = d0.select(
        floor(col("doc_id") / 25).cast("long").as("file_id"),
        col("doc_id"),
        concat(lit("http://site"), m, lit(".com"), path).as("uri"),
        when(pmod(col("doc_id"), lit(11)) === 0, lit(404))
          .otherwise(lit(200)).as("status"),
        col("text"),
        pmod(floor(col("doc_id") / 25), lit(2)).cast("int").as("gzip"))
      val fetched = Warc.parseWarc(Warc.encodeWarc(params))
        .filter(col("warc_type") === "response" && col("http_status") === 200)
        .select(
          regexp_extract(col("target_uri"), "(\\d+)$", 1)
            .cast("long").as("doc_id"),
          regexp_extract(col("target_uri"), "^http://([^/]+)", 1).as("host"),
          regexp_extract(col("target_uri"), "^http://[^/]+(/.*)$", 1).as("path"),
          regexp_extract(col("target_uri"), "^http://[^/]+/([^/]+)/", 1).as("lang"),
          col("body_text").as("text"))

      // ---- stage 1: robots.txt gate. Policies: '*' group bans /private/
      // (with a longer Allow carve-out for /private/pub); even-numbered
      // domains add a GraftBot-specific group banning /tmp/ — and per RFC
      // 9309 an agent with its OWN group ignores '*' entirely, so on even
      // domains ONLY the /tmp/ ban applies to graftbot.
      val dcol = col("id")
      val robotsTxt = s.range(0, 20).toDF("id")
        .select(concat(lit("site"), dcol, lit(".com")).as("domain"),
          concat(
            lit("# site"), dcol, lit(" policy\n"),
            lit("User-Agent: *\nDisallow: /*/private/\nAllow: /*/private/pub\n"),
            when(pmod(dcol, lit(2)) === 0,
              lit("\nUser-Agent: GraftBot\nDisallow: /*/tmp/*\n"))
              .otherwise(lit("")))
            .as("content"))
      val gated = Robots.allowedUrls(fetched, col("doc_id"), col("host"),
          col("path"), Robots.parseRobots(robotsTxt), agent = "graftbot")
        .filter(col("allowed") === 1)
        .drop("agent_group", "allowed")

      // ---- stage 2: per-registrable-domain quota (hash-order pick)
      val quota = Sampling.kPerGroup(
        gated.withColumn("domain",
          TextFunctions.registrableDomain(col("host"))),
        Seq(col("domain")), col("doc_id"), DomainCap)

      // ---- stage 3: Gopher quality gate — per-row predicate, no join.
      // MATERIALIZED (r14): removeBoilerplateLines consumes its input
      // three times (line-frequency pass, kept-line reassembly pass, and
      // the per-doc n_lines base), and unmaterialized each consumer
      // re-executed the whole WARC→robots→quota chain (measured ~0.9 s
      // of q134) — the same between-phase checkpoint posture as
      // `cleaned` below.
      val quality = quota.filter(
        QualityRules.keepFlag(col("text"), minStopwords = 1))
        .localCheckpoint()

      // ---- stage 4: corpus-level boilerplate-line removal (q121's
      // 3-token chunk lines); lang rides the carry seam. The stage
      // boundary is MATERIALIZED (localCheckpoint): the near-dup stage
      // consumes it from four subtrees (shingle/sign side, two verify
      // joins, the survivor anti-join's left side), and without
      // materialization each one re-executes the whole
      // WARC→robots→quota→Gopher→line-dedup chain — exactly the
      // between-phase checkpoint a production curation run writes.
      // localCheckpoint rather than persist: checkpoint blocks release
      // via ContextCleaner once the frame is unreferenced, where a
      // CacheManager entry would pin storage memory until an explicit
      // unpersist this lazy query has no place to issue.
      val cleaned = Dedup.removeBoilerplateLines(
          quality, col("doc_id"),
          CurationQueries.tokenChunkLines(col("text"), 3),
          minDocs = 5, carry = Seq("lang" -> col("lang")))
        .select(col("id").as("doc_id"), col("lang"),
          col("text_clean").as("text"))
        .localCheckpoint()

      // ---- stage 5: near-dup removal over the CLEANED text (q86 knobs)
      val survivors = Dedup.removeNearDuplicates(cleaned, col("doc_id"),
        col("text"), shingleSize = 3, numHashes = 32, bands = 8,
        threshold = 0.3)

      // ---- stage 6: temperature-scaled language mixture (q117 knobs)
      Mixture.temperatureWeights(survivors, Seq(col("lang")),
          alpha = 0.5, budget = 1000)
        .select(col("lang"), col("n_docs"),
          round(col("weight"), 6).as("weight"), col("quota"))
    }))

  val oracles: Map[String, String] = Map(
    "q134_curation_pipeline" -> {
      val toks = AnalyticsQueries.toksSql
      s"""WITH RECURSIVE
         base AS (SELECT doc_id, lang, text,
             CAST(doc_id % 5 AS INT) AS sub, CAST(doc_id % 20 AS INT) AS m
           FROM documents WHERE doc_id < 400),
         -- stage 0: 404s (doc_id % 11 = 0) dropped at ingest
         resp AS (SELECT * FROM base WHERE doc_id % 11 <> 0),
         -- stage 1: robots verdict in closed form (odd domains: '*' group
         -- bans /private/ except /private/pub; even domains: graftbot's
         -- own group bans only /tmp/)
         gated AS (SELECT * FROM resp
           WHERE NOT ((m % 2 = 1 AND sub = 0) OR (m % 2 = 0 AND sub = 2))),
         -- stage 2: domain quota, hash-order pick (Sampling.hashBucket)
         bk AS (SELECT *,
             ((doc_id % 2147483647) * 2654435761) % 2147483647 % 1048576 AS b
           FROM gated),
         capped AS (SELECT doc_id, lang, text FROM (
             SELECT *, ROW_NUMBER() OVER
               (PARTITION BY m ORDER BY b, doc_id) AS rk FROM bk)
           WHERE rk <= $DomainCap),
         -- stage 3: Gopher keep predicate (q113 signals, minStopwords 1)
         gtk AS (SELECT doc_id, lang, text, $toks AS toks,
             string_split(text, chr(10)) AS lns FROM capped),
         quality AS (SELECT doc_id, lang, text, toks FROM gtk
           WHERE len(toks) BETWEEN 50 AND 100000
             AND (CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                 / len(toks) END) BETWEEN 3.0 AND 10.0
             AND (CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
                 / len(toks) END) <= 0.1
             AND (CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks)
               END) >= 0.8
             AND len(list_intersect(
               list_distinct(list_transform(toks, x -> lower(x))),
               ['the','be','to','of','and','that','have','with'])) >= 1
             AND (CAST(len(list_filter(lns,
               l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) / len(lns)) <= 0.9
             AND (CAST(len(list_filter(lns,
               l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$$'))) AS DOUBLE)
               / len(lns)) <= 0.3),
         -- stage 4: boilerplate-line removal (3-token chunks, minDocs 5)
         dl AS (SELECT doc_id, lang, ${CurationQueries.chunkLinesSql(3)} AS lines
           FROM quality),
         el AS (SELECT doc_id, u.i AS pos, lines[u.i + 1] AS line
           FROM dl, unnest(range(0, len(lines))) AS u(i)),
         hl AS (SELECT doc_id, pos, line,
             ${CurationQueries.polyHashSqlLine("line")} AS lh FROM el),
         fl AS (SELECT lh FROM (SELECT DISTINCT doc_id, lh FROM hl)
           GROUP BY lh HAVING COUNT(*) >= 5),
         kl AS (SELECT hl.doc_id, hl.pos, hl.line FROM hl
           LEFT JOIN fl ON hl.lh = fl.lh WHERE fl.lh IS NULL),
         al AS (SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS text_clean
           FROM kl GROUP BY doc_id),
         cleaned AS (SELECT dl.doc_id, dl.lang,
             COALESCE(al.text_clean, '') AS text
           FROM dl LEFT JOIN al USING (doc_id)),
         -- stage 5: near-dup removal over the cleaned text (q86 oracle
         -- form: portable LSH pipeline + recursive component closure)
         ${AnalyticsQueries.lshCtes(src = "cleaned")},
         pairs AS (SELECT id_a, id_b FROM v
           WHERE inter / CAST(na + nb - inter AS DOUBLE) >= 0.3),
         edges(a, b) AS (SELECT id_a, id_b FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach(a, b) AS (SELECT a, b FROM edges
           UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS c FROM reach GROUP BY a),
         surv AS (SELECT lang FROM cleaned
           WHERE doc_id NOT IN (SELECT id FROM comp WHERE c < id)),
         -- stage 6: temperature mixture (q117 oracle form)
         cnt AS (SELECT lang, COUNT(*) AS n FROM surv GROUP BY 1),
         tz AS (SELECT SUM(CAST(SQRT(CAST(n AS DOUBLE)) AS DECIMAL(28,12))) AS z
           FROM cnt)
         SELECT lang, CAST(n AS BIGINT) AS n_docs,
           ROUND(SQRT(CAST(n AS DOUBLE)) / CAST(z AS DOUBLE), 6) AS weight,
           CAST(ROUND(SQRT(CAST(n AS DOUBLE)) / CAST(z AS DOUBLE) * 1000, 0)
             AS BIGINT) AS quota
         FROM cnt, tz"""
    })
}
