package graft.queries

import graft.core.Tables
import graft.operators.{AsofJoin, Skew}
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

    // As-of join: for each order, the user's latest event at or before the
    // order timestamp (ties on ts resolved to max event_id). Left-outer:
    // orders with no prior event keep nulls.
    "q62_asof_last_event" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val events = t(s, dir, "events")
      AsofJoin.backward(
          orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("o_custkey"), col("o_orderdate"),
          events, col("user_id"), col("ts"),
          Seq(
            "last_event_id" -> col("event_id"),
            "last_event_type" -> col("event_type"),
            "last_event_ts" -> date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")),
          rightTiebreak = col("event_id"))
        .select(col("o_orderkey"), col("last_event_id"),
          col("last_event_type"), col("last_event_ts"))
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
    }))

  val oracles: Map[String, String] = Map(
    "q62_asof_last_event" ->
      """WITH j AS (
           SELECT o.o_orderkey, e.event_id, e.event_type, e.ts,
             ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
               ORDER BY e.ts DESC, e.event_id DESC) AS rn
           FROM orders o
           JOIN events e ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
         SELECT o.o_orderkey,
           j.event_id AS last_event_id,
           j.event_type AS last_event_type,
           STRFTIME(j.ts, '%Y-%m-%d %H:%M:%S') AS last_event_ts
         FROM orders o
         LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (o_orderkey)""",
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
         GROUP BY l_returnflag""")
}
