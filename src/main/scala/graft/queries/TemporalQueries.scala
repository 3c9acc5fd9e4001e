package graft.queries

import graft.core.Tables
import graft.functions.DateFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-parsing semantics (SURVEY.md §2.8 F3/F4, §2.2 P9): the reference's
  * five literal formats, relative "N天/周/月前" expressions, and the
  * missing-date-rejects time filter — exercised as round-trips: the query
  * side renders dates into the reference's wire formats and parses them
  * back with the engine's parser; the oracle computes the same result
  * directly from the typed column, so any parser defect breaks the match.
  */
object TemporalQueries {

  private val fmtSpark = Seq("yyyy-MM-dd", "yyyy/MM/dd", "yyyy.MM.dd", "yyyy年MM月dd日", "yyyyMMdd")

  /** Render o_orderdate in format (o_orderkey % 5) — the multi-format corpus. */
  private def multiFormatString: Column = {
    val f = pmod(col("o_orderkey"), lit(5))
    fmtSpark.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (fmt, i)) =>
      when(f === i, date_format(col("o_orderdate"), fmt)).otherwise(acc)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F3: multi-format render → coalesce-parse round trip.
    "q21_multiformat_dates" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .withColumn("raw", multiFormatString)
        .withColumn("parsed", DateFunctions.parseMultiFormat(col("raw")))
        .groupBy(year(col("parsed")).as("y"))
        .agg(count(lit(1)).as("n"))
    }),

    // F4: relative expressions against a fixed anchor.
    "q22_relative_dates" -> ((s, dir) => {
      val n = pmod(col("user_id"), lit(7)) + 1
      val unit = when(pmod(col("user_id"), lit(3)) === 0, "天")
        .when(pmod(col("user_id"), lit(3)) === 1, "周").otherwise("月")
      Tables.load(s, dir, "events")
        .select(col("user_id")).distinct()
        .withColumn("expr", concat(n.cast("string"), unit, lit("前")))
        .withColumn("resolved",
          date_format(DateFunctions.parseRelative(col("expr"),
            lit("2024-06-01").cast("date")), "yyyy-MM-dd"))
        .select(col("user_id"), col("resolved"))
    }),

    // P9 time-range filter: unparseable dates are REJECTED when a filter is
    // set (1 in 7 rows rendered as garbage).
    "q23_time_filter" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .withColumn("raw",
          when(pmod(col("o_orderkey"), lit(7)) === 0, lit("日期不详"))
            .otherwise(multiFormatString))
        .withColumn("d", DateFunctions.parseMultiFormat(col("raw")))
        .filter(DateFunctions.inRange(col("d"),
          lit("1996-01-01").cast("date"), lit("1997-06-30").cast("date")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    }),

    // F3 range + bare-year fallback: "1996 - 1998" / "1997" style strings.
    "q24_range_parse" -> ((s, dir) => {
      val y = year(col("o_orderdate"))
      Tables.load(s, dir, "orders")
        .withColumn("raw",
          when(pmod(col("o_orderkey"), lit(2)) === 0,
            concat(y.cast("string"), lit(" - "), (y + 2).cast("string")))
            .otherwise(y.cast("string")))
        .withColumn("r", DateFunctions.parseRange(col("raw")))
        .select(
          col("o_orderkey"),
          date_format(col("r.start"), "yyyy-MM-dd").as("range_start"),
          date_format(col("r.end"), "yyyy-MM-dd").as("range_end"))
    }),

    // W3 running-offset frame + F5 MM:SS rendering (the scene-offset
    // accumulation of dify_transformation.py).
    "q25_scene_offsets" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity").as("duration"))
      graft.operators.Sessionize
        .runningOffset(li, col("l_orderkey"),
          struct(col("l_linenumber"), col("l_partkey"), col("duration")), col("duration"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("offset").cast("double").as("offset"),
          DateFunctions.mmss(col("offset")).as("offset_mmss"))
    }),

    // W3's trickiest semantics (DIFYX:193-208): a raw subtitle time already
    // ≥ the scene offset is ABSOLUTE; otherwise it is scene-RELATIVE and
    // shifts by the offset. Runs in exact integer centiseconds (durations ×
    // 100) so the oracle reproduces every value with pure BIGINT
    // arithmetic — no float summation-order hazard in the running frame.
    "q80_subtitle_times" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("dur_c"))
      graft.operators.Sessionize.runningOffset(
          li, col("l_orderkey"),
          struct(col("l_linenumber"), col("l_partkey"), col("dur_c")), col("dur_c"),
          zero = lit(0L))
        .withColumn("offset_c", col("offset").cast("long"))
        // synthesize a mixed stream: every 3rd line reports absolute time
        // (offset + half its duration), the rest scene-relative quarters
        .withColumn("raw_c",
          when(pmod(col("l_linenumber"), lit(3)) === 0,
            col("offset_c") + expr("dur_c DIV 2"))
            .otherwise(expr("dur_c DIV 4")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("raw_c"),
          graft.operators.Sessionize
            .resolveAbsoluteTime(col("raw_c"), col("offset_c")).as("resolved_c"),
          (col("raw_c") >= col("offset_c")).as("is_absolute"))
    }))

  val oracles: Map[String, String] = Map(
    "q21_multiformat_dates" ->
      """SELECT YEAR(o_orderdate) AS y, COUNT(*) AS n FROM orders GROUP BY 1""",
    "q22_relative_dates" ->
      """SELECT DISTINCT user_id,
           STRFTIME(DATE '2024-06-01' - CAST(((user_id % 7) + 1) *
             (CASE user_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 7 ELSE 30 END) AS INTEGER),
             '%Y-%m-%d') AS resolved
         FROM events""",
    "q23_time_filter" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
         WHERE o_orderkey % 7 <> 0
           AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-06-30'
         GROUP BY o_orderpriority""",
    "q24_range_parse" ->
      """SELECT o_orderkey,
           STRFTIME(MAKE_DATE(YEAR(o_orderdate), 1, 1), '%Y-%m-%d') AS range_start,
           CASE WHEN o_orderkey % 2 = 0
             THEN STRFTIME(MAKE_DATE(YEAR(o_orderdate) + 2, 1, 1), '%Y-%m-%d')
             ELSE STRFTIME(MAKE_DATE(YEAR(o_orderdate), 1, 1), '%Y-%m-%d') END AS range_end
         FROM orders""",
    "q25_scene_offsets" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) AS offset,
           PRINTF('%02d:%02d',
             CAST(FLOOR(CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) / 60) AS INTEGER),
             CAST(CAST(FLOOR(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS BIGINT) % 60 AS INTEGER)) AS offset_mmss
         FROM lineitem""",
    "q80_subtitle_times" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_partkey,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS dur_c
           FROM lineitem),
         o AS (SELECT *,
             CAST(COALESCE(SUM(dur_c) OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, dur_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_c
           FROM t),
         r AS (SELECT *,
             CASE WHEN l_linenumber % 3 = 0 THEN offset_c + dur_c // 2
                  ELSE dur_c // 4 END AS raw_c
           FROM o)
         SELECT l_orderkey, l_linenumber, l_partkey, raw_c,
           CASE WHEN raw_c >= offset_c THEN raw_c ELSE offset_c + raw_c END AS resolved_c,
           (raw_c >= offset_c) AS is_absolute
         FROM r""")
}
