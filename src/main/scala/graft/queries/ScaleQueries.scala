package graft.queries

import graft.core.Tables
import graft.operators.{AsofJoin, Layout, Packing, RangeJoin, Sampling, Skew}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture operators, oracle-checked: as-of join (union+window form),
  * salted join + two-phase salted aggregation, and Bloom-prefiltered exact
  * semi-join. Each query's DuckDB oracle states the PLAIN relational
  * semantics (unsalted join, windowed as-of, IN-subquery) — the engine
  * forms must be bit-identical while shuffling less / spreading hot keys.
  */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: for each error event, the same user's latest click at or
    // before it (ties on ts resolved to max event_id). Left-outer: errors
    // with no prior click keep nulls. Self as-of on the event stream — the
    // "state of the user at incident time" enrichment shape.
    "q62_asof_last_event" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val errors = events.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      val clicks = events.filter(col("event_type") === "click")
      AsofJoin.backward(
          errors, col("e_user"), col("e_ts"),
          clicks, col("user_id"), col("ts"),
          Seq(
            "last_click_id" -> col("event_id"),
            "last_click_ts" -> date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")),
          rightTiebreak = col("event_id"))
        .select(col("event_id"), col("last_click_id"), col("last_click_ts"))
    }),

    // Salted join + salted two-phase aggregation; oracle is the plain
    // join+group — salting must be invisible in the result.
    "q63_salted_segment_revenue" -> ((s, dir) => {
      val fact = t(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
      val dim = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val joined = Skew.saltedJoin(fact, dim, "c_custkey", salts = 8)
      Skew.saltedAgg(joined, Seq(col("c_mktsegment")), salts = 8,
        partial = Seq(sum(dec(col("o_totalprice"))).as("rev"), count(lit(1)).as("n")),
        merge = Seq(sum(col("rev")).cast("double").as("revenue"),
          sum(col("n")).as("n_orders")))
    }),

    // Bloom-prefiltered exact semi-join: lineitems of urgent orders. The
    // Bloom probe prunes at the scan; the exact semi-join removes its false
    // positives — result == plain IN-subquery.
    "q64_bloom_semi_urgent" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Skew.bloomSemiJoin(
          t(s, dir, "lineitem"), col("l_orderkey"),
          urgent, col("o_orderkey"),
          expectedItems = 100000L)
        .groupBy(col("l_returnflag"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
    }),

    // Binned range join: for each purchase event, all of the same user's
    // events in the following hour (anchor included — ts >= anchor). The
    // oracle states the naive inequality join; the engine form is the
    // bucketed equi-join + exact refine.
    "q65_range_window_stats" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val anchors = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("anchor_id"), col("user_id").as("a_user"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      val points = ev.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
      RangeJoin.pointInInterval(
          points, col("p_user"), col("p_ts"),
          anchors, col("a_user"), col("w_start"), col("w_end"),
          binWidthSeconds = 3600L)
        .groupBy(col("anchor_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("p_value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          date_format(max(col("p_ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
    }),

    // Deterministic train/val/test split — assignment is a pure function
    // of doc_id (engine-independent modular hash), which is why a DuckDB
    // oracle can reproduce it row for row.
    "q66_hash_split" -> ((s, dir) => {
      Sampling.hashSplit(
          t(s, dir, "documents").select(col("doc_id")), col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("bucket"), col("split"))
    }),

    // Sequence packing: concat-and-split documents into 4096-char context
    // windows per language, ordered by doc_id.
    "q67_pack_sequences" -> ((s, dir) => {
      Packing.concatPack(
          t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          orderBy = Seq(col("doc_id")), tokens = col("n_chars"), budget = 4096L,
          groupCols = Seq(col("lang")))
        .select(col("doc_id"), col("lang"), col("start_offset"), col("pack_id"))
    }),

    // q62's as-of semantics through the WHOLE-OPERATOR plan
    // (graft.plans.AsofMergeJoin: custom LogicalPlan -> Strategy ->
    // streaming-merge BinaryExecNode) — same oracle shape as q62, so the
    // custom exec is hash-gated against plain SQL semantics.
    "q75_asof_merge_exec" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val errors = events.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("last_click_id"))
      AsofJoin.backwardMerge(
          errors, clicks, Seq("e_user"), Seq("c_user"), "e_ts", "c_ts",
          rightTiebreak = Some("last_click_id"))
        .select(col("event_id"), col("last_click_id"),
          date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("last_click_ts"))
    }),

    // Forward as-of through the same custom exec (earliest click AT or
    // AFTER each error; ties to min event_id) — hash-gates the second
    // merge path, which only specs covered before.
    "q79_asof_forward_exec" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val errors = events.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("next_click_id"))
      AsofJoin.forwardMerge(
          errors, clicks, Seq("e_user"), Seq("c_user"), "e_ts", "c_ts",
          rightTiebreak = Some("next_click_id"))
        .select(col("event_id"), col("next_click_id"),
          date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("next_click_ts"))
    }),

    // Pack utilization: docs and tokens starting in each pack, fill ratio.
    "q68_pack_stats" -> ((s, dir) => {
      val packed = Packing.concatPack(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        orderBy = Seq(col("doc_id")), tokens = col("n_chars"), budget = 4096L,
        groupCols = Seq(col("lang")))
      Packing.packStats(packed, col("n_chars"), 4096L, Seq(col("lang")))
    }),

    // Z-order layout assignment: Morton key of (l_orderkey, l_partkey)
    // folded to 12 bits each, plus the 64-way file bucket the clustered
    // write would place each row in. The oracle replays the 5-step
    // shift-or-mask spread ladder integer for integer — certifying the
    // exact bit interleave the pruning guarantees rest on.
    "q144_zorder_key" -> ((s, dir) => {
      val x = pmod(col("l_orderkey"), lit(4096L))
      val y = pmod(col("l_partkey"), lit(4096L))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          Layout.zOrderKey(x, y).as("zkey"))
        .withColumn("file_bucket", shiftright(col("zkey"), 18).cast("int"))
    }))

  val oracles: Map[String, String] = Map(
    "q144_zorder_key" -> {
      // the bitSpread ladder's canonical SQL twin (one definition,
      // shared with q195's geohash oracle)
      def spread(v: String): String =
        graft.operators.Layout.bitSpreadSql(v)
      s"""SELECT l_orderkey, l_partkey, l_linenumber,
           (${spread("l_orderkey % 4096")} |
            (${spread("l_partkey % 4096")} << 1)) AS zkey,
           CAST((${spread("l_orderkey % 4096")} |
            (${spread("l_partkey % 4096")} << 1)) >> 18 AS INT) AS file_bucket
         FROM lineitem"""
    },
    "q62_asof_last_event" ->
      """WITH j AS (
           SELECT a.event_id, b.event_id AS c_id, CAST(b.ts AS TIMESTAMP) AS c_ts,
             ROW_NUMBER() OVER (PARTITION BY a.event_id
               ORDER BY CAST(b.ts AS TIMESTAMP) DESC, b.event_id DESC) AS rn
           FROM events a
           JOIN events b ON b.user_id = a.user_id AND b.event_type = 'click'
             AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP)
           WHERE a.event_type = 'error')
         SELECT a.event_id,
           j.c_id AS last_click_id,
           STRFTIME(j.c_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
         FROM events a
         LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
         WHERE a.event_type = 'error'""",
    "q79_asof_forward_exec" ->
      """WITH j AS (
           SELECT a.event_id, b.event_id AS c_id, CAST(b.ts AS TIMESTAMP) AS c_ts,
             ROW_NUMBER() OVER (PARTITION BY a.event_id
               ORDER BY CAST(b.ts AS TIMESTAMP) ASC, b.event_id ASC) AS rn
           FROM events a
           JOIN events b ON b.user_id = a.user_id AND b.event_type = 'click'
             AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
           WHERE a.event_type = 'error')
         SELECT a.event_id,
           j.c_id AS next_click_id,
           STRFTIME(j.c_ts, '%Y-%m-%d %H:%M:%S') AS next_click_ts
         FROM events a
         LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
         WHERE a.event_type = 'error'""",
    "q75_asof_merge_exec" ->
      """WITH j AS (
           SELECT a.event_id, b.event_id AS c_id, CAST(b.ts AS TIMESTAMP) AS c_ts,
             ROW_NUMBER() OVER (PARTITION BY a.event_id
               ORDER BY CAST(b.ts AS TIMESTAMP) DESC, b.event_id DESC) AS rn
           FROM events a
           JOIN events b ON b.user_id = a.user_id AND b.event_type = 'click'
             AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP)
           WHERE a.event_type = 'error')
         SELECT a.event_id,
           j.c_id AS last_click_id,
           STRFTIME(j.c_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
         FROM events a
         LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
         WHERE a.event_type = 'error'""",
    "q63_salted_segment_revenue" ->
      """SELECT c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q64_bloom_semi_urgent" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_items
         FROM lineitem
         WHERE l_orderkey IN
           (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag""",
    "q65_range_window_stats" ->
      """SELECT a.event_id AS anchor_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(b.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           STRFTIME(MAX(CAST(b.ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS last_ts
         FROM events a
         JOIN events b ON b.user_id = a.user_id
           AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
           AND CAST(b.ts AS TIMESTAMP) < CAST(a.ts AS TIMESTAMP) + INTERVAL 1 HOUR
         WHERE a.event_type = 'purchase'
         GROUP BY 1""",
    "q66_hash_split" ->
      """SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 AS bucket
               FROM documents) t""",
    "q67_pack_sequences" ->
      """SELECT doc_id, lang, start_offset, start_offset // 4096 AS pack_id
         FROM (SELECT doc_id, lang,
                 CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start_offset
               FROM documents) t""",
    "q68_pack_stats" ->
      """WITH packed AS (
           SELECT lang, n_chars,
             CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               // 4096 AS pack_id
           FROM documents)
         SELECT lang, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_tokens,
           ROUND(SUM(n_chars) / 4096.0, 4) AS fill
         FROM packed GROUP BY 1, 2""")
}
