package graft.queries

import graft.core.Tables
import graft.operators.Journey
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-grade analytics over the synthetic tables — the r7
  * continuation wave: event-journey analytics (funnel conversion, cohort
  * retention, time-grid resampling with forward fill) plus dataset ops
  * (snapshot diff, column profiling, portable sketches, triangle
  * counting, sentence-aware chunking). Every query is DuckDB
  * oracle-checked; scale notes live on the operator scaladocs.
  */
object WarehouseQueries {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "events")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** q172's funnel definition: stage order + anchor window (72 h). */
  private val funnelStages = Seq("signup", "view", "click", "purchase")
  private val funnelWindowSec = 259200L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Funnel conversion: signup → view → click → purchase within 72 h of
    // the signup anchor (chained-min semantics, one shuffle on user).
    "q172_funnel" -> ((s, dir) => {
      val depths = Journey.funnel(ev(s, dir), col("user_id"), col("ts"),
        col("event_type"), funnelStages, funnelWindowSec)
      Journey.funnelReport(depths, funnelStages)
    }),

    // Weekly cohort retention matrix: cohort = week of first event,
    // offset = whole weeks since, distinct users per cell.
    "q173_cohort_retention" -> ((s, dir) =>
      Journey.cohortRetention(ev(s, dir), col("user_id"), col("ts"))),

    // Hourly resample per user with forward-filled value sums; gap rows
    // flagged. Grid bounded by time-range/step, not event count.
    "q174_resample_ffill" -> ((s, dir) => {
      Journey.resampleFfill(ev(s, dir), col("user_id"), col("ts"),
          dec(col("value")), stepUnit = "hour")
        .select(col("key").as("user_id"), tstr(col("bucket")).as("hour"),
          col("n_events"), col("filled_value").cast("double").as("filled_value"),
          col("gap"))
    }))

  private val funnelWinUs = funnelWindowSec * 1000000L

  val oracles: Map[String, String] = Map(

    "q172_funnel" ->
      s"""WITH f AS (
           SELECT user_id, EPOCH_US(ts) AS tus,
             CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
                  WHEN 'click' THEN 2 WHEN 'purchase' THEN 3
                  ELSE -1 END AS si
           FROM events),
         a1 AS (SELECT user_id, MIN(tus) AS t1, MIN(tus) AS rt
                FROM f WHERE si = 0 GROUP BY user_id),
         a2 AS (SELECT f.user_id, MIN(a.t1) AS t1, MIN(f.tus) AS rt
                FROM f JOIN a1 a USING (user_id)
                WHERE f.si = 1 AND f.tus > a.rt AND f.tus <= a.t1 + $funnelWinUs
                GROUP BY f.user_id),
         a3 AS (SELECT f.user_id, MIN(a.t1) AS t1, MIN(f.tus) AS rt
                FROM f JOIN a2 a USING (user_id)
                WHERE f.si = 2 AND f.tus > a.rt AND f.tus <= a.t1 + $funnelWinUs
                GROUP BY f.user_id),
         a4 AS (SELECT f.user_id, MIN(a.t1) AS t1, MIN(f.tus) AS rt
                FROM f JOIN a3 a USING (user_id)
                WHERE f.si = 3 AND f.tus > a.rt AND f.tus <= a.t1 + $funnelWinUs
                GROUP BY f.user_id),
         c AS (
           SELECT 1 AS stage_no, 'signup' AS stage, (SELECT COUNT(*) FROM a1) AS n
           UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM a2)
           UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM a3)
           UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM a4))
         SELECT CAST(stage_no AS INT) AS stage_no, stage,
           CAST(n AS BIGINT) AS n_users,
           ROUND(n / (SELECT CAST(COUNT(*) AS DOUBLE) FROM a1), 4) AS pct_of_first
         FROM c WHERE n > 0""",

    "q173_cohort_retention" ->
      """WITH u AS (
           SELECT user_id, DATE_TRUNC('week', ts) AS wk,
             MIN(DATE_TRUNC('week', ts)) OVER (PARTITION BY user_id) AS cohort
           FROM events),
         d AS (SELECT DISTINCT user_id, cohort, wk FROM u)
         SELECT STRFTIME(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(DATE_DIFF('day', cohort, wk) / 7 AS INT) AS week_offset,
           COUNT(*) AS n_users
         FROM d GROUP BY 1, 2""",

    "q174_resample_ffill" ->
      """WITH h AS (
           SELECT user_id, DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
           FROM events GROUP BY 1, 2),
         b AS (SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi FROM h GROUP BY 1),
         g AS (SELECT user_id,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
           FROM b)
         SELECT g.user_id, STRFTIME(g.hr, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           CAST(LAST_VALUE(h.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hr
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS filled_value,
           CAST(CASE WHEN h.user_id IS NULL THEN 1 ELSE 0 END AS INT) AS gap
         FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr""")
}
