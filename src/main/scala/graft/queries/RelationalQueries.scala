package graft.queries

import graft.core.Tables
import graft.operators.{Ranking, Rrf}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: aggregation, joins (broadcast/semi/anti), windows,
  * set ops, rollup/cube — SURVEY.md §2.3/§2.4/§2.5/§2.6/§2.7 over the
  * driver's synthetic tables.
  *
  * Determinism conventions (required for the DuckDB-oracle hash match):
  *  - money arithmetic is done in DECIMAL(18,2) (exact, order-independent),
  *    surfaced as DOUBLE only at the end;
  *  - every window order carries a unique tiebreak key;
  *  - float outputs are rounded explicitly on both sides.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-family aggregation with decimal-exact sums (TPC-H Q1 shape).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Star join: facts × two broadcast dims (J1 enrichment shape).
    "q02_region_revenue" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(nation, cust("c_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // W2 top-k per group (the per-task top_k slice, retrieve.py:352-387).
    "q03_top_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
    }),

    // W3 running-total frame (cumulative spend per customer).
    "q04_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "orders")
        .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
    }),

    // A1 RRF fusion: each event_type is a ranked list of users by exact
    // decimal engagement; fused by Σ 1/(60+rank) (retrieve.py:153-181).
    "q05_rrf_users" -> ((s, dir) => {
      val perList = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(dec(col("value"))).as("sv"))
      Rrf.fuse(perList, col("event_type"), col("user_id"), col("sv"),
          k = 60, tiebreak = col("user_id"))
        .select(col("item").as("user_id"),
          round(col("rrf_score"), 6).as("rrf_score"),
          col("n_lists"), col("best_rank"))
    }),

    // A9/W5 keep-first with precedence order (latest order wins).
    "q06_latest_order_per_cust" -> ((s, dir) => {
      Ranking.keepFirst(
          t(s, dir, "orders"),
          Seq(col("o_custkey")),
          Seq(col("o_orderdate").desc, col("o_orderkey").desc))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_order_date"))
    }),

    // J8-shape anti join: customers with no orders.
    "q07_customers_no_orders" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // J4-shape semi join: suppliers located where at least one customer is.
    "q08_suppliers_customer_nations" -> ((s, dir) => {
      val supp = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      supp.join(cust, supp("s_nationkey") === cust("c_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // U1 union + A7 distinct.
    "q09_union_dedup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
        .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
        .distinct()
    }),

    // U3 difference.
    "q10_except_urgent" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
        .except(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
    }),

    // U4 intersection (the last set operator without an oracle row).
    "q84_intersect_urgent_high" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_totalprice") > 300000).select(col("o_orderkey"))
        .intersect(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
    }),

    // Rollup (engine capability beyond the reference — SURVEY.md §2.4 note).
    "q11_rollup_revenue" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(nation, cust("c_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // Cube.
    "q12_cube_counts" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    }),

    // J7 ordered positional join: i-th order by date ↔ i-th by price
    // (through the library helper — self-join safe).
    "q13_positional_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("key_by_date"), col("o_orderdate"), col("o_orderkey"))
      val r = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("key_by_price"), col("o_totalprice"), col("o_orderkey"))
      Ranking.positionalJoin(l, r, Seq("custkey"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("custkey"), col("pos"), col("key_by_date"),
          col("key_by_price_r").as("key_by_price"))
    }),

    // A3 nested regrouping, rendered as a deterministic string (the
    // db→doc→blocks output tree of retrieve.py:500-541).
    "q14_nested_regroup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
              x => concat(x.getField("l_linenumber").cast("string"), lit(":"),
                x.getField("l_partkey").cast("string"))), ",").as("items"),
          count(lit(1)).as("n_items"))
    }),

    // Pivot (engine capability beyond the reference, like q11/q12): order
    // status columns per priority. Explicit pivot values — an inferred
    // value list would be a driver-side distinct scan; money sums ride
    // DECIMAL so the aggregate is partition-order invariant. Compiles to
    // ONE hash aggregate (PivotFirst), not one pass per status.
    "q162_pivot_status" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"),
          count(lit(1)).as("n"))
    }),

    // Unpivot / melt — the inverse reshape, lossless long form of two
    // measure columns (a narrow Expand projection: no shuffle, rows×2).
    "q163_unpivot_part" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("retailprice"),
          col("p_size").cast("double").as("size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("retailprice"), col("size")), "attr", "val")
    }),

    // Parquet AGGREGATE pushdown: MIN/MAX/COUNT answered from row-group
    // statistics — a metadata-only scan that never decodes data pages. At
    // 100 TB this turns a corpus profile into a footer read. Needs the
    // DSv2 parquet path; both flags are scoped to an isolated session
    // (the compactParquet lesson: never mutate the shared one). Numeric
    // columns only: ONE unsupported aggregate type (e.g. a timestamp
    // min) disables pushdown for the whole scan, so the profile sticks
    // to the stats-backed types — EntropyAggSpec pins a non-empty
    // `PushedAggregation` in the scan and value-equality with the
    // ordinary v1 aggregate.
    "q165_agg_pushdown" -> ((s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      s2.conf.set("spark.sql.sources.useV1SourceList", "")
      t(s2, dir, "lineitem")
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    }))

  val oracles: Map[String, String] = Map(
    "q162_pivot_status" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'O'
           THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O_rev,
         CASE WHEN COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) = 0 THEN NULL
           ELSE COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) END AS O_n,
         CAST(SUM(CASE WHEN o_orderstatus = 'F'
           THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F_rev,
         CASE WHEN COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) = 0 THEN NULL
           ELSE COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) END AS F_n,
         CAST(SUM(CASE WHEN o_orderstatus = 'P'
           THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P_rev,
         CASE WHEN COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) = 0 THEN NULL
           ELSE COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) END AS P_n
         FROM orders GROUP BY o_orderpriority""",
    "q163_unpivot_part" ->
      """SELECT p_partkey, 'retailprice' AS attr,
           CAST(p_retailprice AS DOUBLE) AS val FROM part
         UNION ALL
         SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part""",
    "q165_agg_pushdown" ->
      """SELECT COUNT(*) AS n_rows,
         MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
         MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
         FROM lineitem""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_region_revenue" ->
      """SELECT r_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q03_top_orders_per_cust" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3""",
    "q04_running_total" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders""",
    "q05_rrf_users" ->
      """WITH per_list AS (
           SELECT event_type, user_id, SUM(CAST(value AS DECIMAL(18,2))) AS sv
           FROM events GROUP BY event_type, user_id),
         ranked AS (
           SELECT event_type, user_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY sv DESC, user_id) AS rnk
           FROM per_list)
         SELECT user_id,
           ROUND(SUM(CAST(1 AS DOUBLE) / (60 + rnk)), 6) AS rrf_score,
           COUNT(*) AS n_lists, MIN(rnk) AS best_rank
         FROM ranked GROUP BY user_id""",
    "q06_latest_order_per_cust" ->
      """SELECT o_custkey, o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS last_order_date
         FROM (SELECT *, ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1""",
    "q07_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q08_suppliers_customer_nations" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = s_nationkey)""",
    "q09_union_dedup" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
         UNION
         SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "q10_except_urgent" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
         EXCEPT
         SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "q84_intersect_urgent_high" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
         INTERSECT
         SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "q11_rollup_revenue" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "q12_cube_counts" ->
      """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY CUBE (c_mktsegment, o_orderpriority)""",
    "q13_positional_join" ->
      """WITH l AS (SELECT o_custkey AS custkey, o_orderkey AS key_by_date,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pos
           FROM orders),
         r AS (SELECT o_custkey AS custkey, o_orderkey AS key_by_price,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS pos
           FROM orders)
         SELECT l.custkey, l.pos, key_by_date, key_by_price
         FROM l JOIN r ON l.custkey = r.custkey AND l.pos = r.pos""",
    "q14_nested_regroup" ->
      """SELECT l_orderkey,
         STRING_AGG(l_linenumber || ':' || l_partkey, ',' ORDER BY l_linenumber, l_partkey) AS items,
         COUNT(*) AS n_items
         FROM lineitem GROUP BY l_orderkey""")
}
