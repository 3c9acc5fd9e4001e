package graft.queries

import graft.core.Tables
import graft.operators.{Divergence, Graph, TableOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-mining & corpus-comparison queries (q231+): cross-source overlap
  * matrices, link-graph hub/authority ranking, concentration audits —
  * the second-order questions a platform asks AFTER the per-table
  * statistics are green ("how do my sources relate to each other, and
  * where is the mass concentrated?").
  */
object MiningQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val toksSql = AnalyticsQueries.toksSql

  /** One HITS iteration as oracle CTEs: authority gather+normalize from
    * h{k-1}, then hub gather+normalize from a{k} — the SQL unroll of
    * [[graft.operators.Graph.hits]] (max-normalized, HUGEINT product).
    */
  private def hitsStageSql(k: Int): String =
    s"""ar$k AS (SELECT d.doc_id AS id, COALESCE(s.c, 0) AS raw
         FROM documents d LEFT JOIN (
           SELECT e.dst AS id, SUM(h.h) AS c
           FROM e JOIN h${k - 1} h ON e.src = h.id GROUP BY 1) s
           ON d.doc_id = s.id),
       am$k AS (SELECT MAX(raw) AS m FROM ar$k),
       a$k AS (SELECT id, CASE WHEN m > 0
           THEN CAST(CAST(raw AS HUGEINT) * 1000000 // m AS BIGINT)
           ELSE 0 END AS a
         FROM ar$k, am$k),
       hr$k AS (SELECT d.doc_id AS id, COALESCE(s.c, 0) AS raw
         FROM documents d LEFT JOIN (
           SELECT e.src AS id, SUM(a.a) AS c
           FROM e JOIN a$k a ON e.dst = a.id GROUP BY 1) s
           ON d.doc_id = s.id),
       hm$k AS (SELECT MAX(raw) AS m FROM hr$k),
       h$k AS (SELECT id, CASE WHEN m > 0
           THEN CAST(CAST(raw AS HUGEINT) * 1000000 // m AS BIGINT)
           ELSE 0 END AS h
         FROM hr$k, hm$k)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact vocabulary-overlap matrix between the 5 language slices:
    // distinct-token supports, pairwise intersection and exact Jaccard —
    // the cross-source contamination screen. The pair fan-out is keyed on
    // the TOKEN (C(k,2) rows per token, k = sources containing it), never
    // on documents.
    "q232_vocab_overlap" -> ((s, dir) =>
      Divergence.vocabOverlap(docs(s, dir), col("lang"), col("text"))),

    // HITS hubs & authorities over the q145 arithmetic link graph —
    // PageRank's sibling slot: link-directory pages (high hub) vs content
    // pages (high authority). 3 rounds of integer fixed-point iteration,
    // max-normalized; the oracle unrolls all six half-steps.
    "q233_hits" -> ((s, dir) => {
      val d = docs(s, dir)
      Graph.hits(d.select(col("doc_id")), col("doc_id"),
          WarehouseQueries.docLinkEdges(d), col("src"), col("dst"),
          iterations = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // Revenue-concentration audit: exact Gini + top-decile share of order
    // totals (in cents) per order priority — the "is the mean a lie?"
    // screen. One window pass + one rollup per group; rank ties carry
    // equal values, so the integer statistic is tie-permutation-invariant.
    "q234_concentration" -> ((s, dir) =>
      TableOps.concentration(Tables.load(s, dir, "orders"),
          Seq(col("o_orderpriority")),
          round(col("o_totalprice") * 100).cast("long"))
        .select(col("g0").as("o_orderpriority"), col("n"), col("total"),
          col("gini"), col("top_decile_share"))))

  val oracles: Map[String, String] = Map(

    "q232_vocab_overlap" ->
      s"""WITH inc AS (SELECT DISTINCT lang AS source, unnest($toksSql) AS tok
           FROM documents),
         sz AS (SELECT source, COUNT(*) AS v FROM inc GROUP BY 1),
         it AS (SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS inter
           FROM inc a JOIN inc b ON a.tok = b.tok AND a.source < b.source
           GROUP BY 1, 2),
         p AS (SELECT a.source AS source_a, b.source AS source_b,
             a.v AS v_a, b.v AS v_b
           FROM sz a JOIN sz b ON a.source < b.source),
         j AS (SELECT source_a, source_b, v_a, v_b,
             COALESCE(inter, 0) AS inter,
             v_a + v_b - COALESCE(inter, 0) AS u
           FROM p LEFT JOIN it USING (source_a, source_b))
         SELECT source_a, source_b, CAST(v_a AS BIGINT) AS v_a,
           CAST(v_b AS BIGINT) AS v_b, CAST(inter AS BIGINT) AS inter,
           CAST(u AS BIGINT) AS n_union,
           CASE WHEN u > 0 THEN
             CAST((2 * inter * 1000000 + u) // (2 * u) AS BIGINT) / 1000000.0
           END AS jaccard
         FROM j""",

    "q233_hits" ->
      s"""WITH ${WarehouseQueries.linkEdgeCtesSql},
         h0 AS (SELECT doc_id AS id, CAST(1000000 AS BIGINT) AS h
           FROM documents),
         ${(1 to 3).map(hitsStageSql).mkString(",\n         ")}
         SELECT h3.id AS doc_id, h3.h AS hub_fp, a3.a AS auth_fp
         FROM h3 JOIN a3 USING (id)""",

    "q234_concentration" ->
      """WITH v AS (SELECT o_orderpriority AS g,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
           FROM orders WHERE o_totalprice IS NOT NULL),
         r AS (SELECT g, x,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS i
           FROM v WHERE x >= 0),
         a AS (SELECT g, COUNT(*) AS n, CAST(SUM(x) AS HUGEINT) AS s,
             SUM(CAST(i AS HUGEINT) * x) AS t
           FROM r GROUP BY 1),
         tm AS (SELECT r.g, CAST(SUM(r.x) AS HUGEINT) AS topm
           FROM r JOIN a ON r.g = a.g
           WHERE r.i > a.n - (a.n + 9) // 10
           GROUP BY 1)
         SELECT a.g AS o_orderpriority, CAST(a.n AS BIGINT) AS n,
           CAST(a.s AS BIGINT) AS total,
           CASE WHEN a.s > 0 THEN
             CAST((2 * (2 * a.t - (a.n + 1) * a.s) * 1000000 + a.n * a.s)
               // (2 * a.n * a.s) AS BIGINT) / 1000000.0
           END AS gini,
           CASE WHEN a.s > 0 THEN
             CAST((2 * tm.topm * 1000000 + a.s) // (2 * a.s) AS BIGINT)
               / 1000000.0
           END AS top_decile_share
         FROM a JOIN tm ON a.g = tm.g""")
}
