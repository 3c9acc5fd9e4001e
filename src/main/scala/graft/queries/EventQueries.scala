package graft.queries

import graft.core.Tables
import graft.functions.Log2Fixed
import graft.operators.{Journey, Ranking, Sessionize}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the batch forms of the
  * engine's streaming capability (SURVEY.md §2.9): sessionization, tumbling
  * windows, per-key summaries (A4/A6), lag analytics, JSON props (F11).
  *
  * Timestamps are surfaced as formatted strings and money/value sums as
  * DECIMAL-exact doubles, per the oracle-parity conventions.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "events")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** The q290/q294 shared subject frame: one row per user with
    * first-touch cohort, duration = days from first activity to the
    * FIRST high-value purchase (value-cents ≥ 5000, the q288 bar) —
    * the conversion event — or to last activity when the user never
    * converts (right-censored). The q200 life-table shape; q290 puts
    * the estimator itself on the hash surface.
    */
  private def kmSubjects(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir).filter(col("ts").isNotNull)
    val day = datediff(col("ts").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val perUser = e.groupBy(col("user_id"))
      .agg(min(day).as("__fd"), max(day).as("__ld"),
        min(when(col("event_type") === "purchase" && cents >= 5000L,
          day)).as("__cd"))
    val cohort = Ranking.keepFirst(
        e.select(col("user_id"), col("ts"), col("event_id"),
          col("event_type")),
        Seq(col("user_id")), Seq(col("ts").asc, col("event_id").asc))
      .select(col("user_id"), col("event_type").as("__cohort"))
    // null-cohort subjects (first touch has a null event_type) are
    // excluded on BOTH engines — see kmSubjectsSql's contract note
    perUser.join(cohort, Seq("user_id"))
      .filter(col("__cohort").isNotNull)
      .select(col("__cohort"),
        (coalesce(col("__cd"), col("__ld")) - col("__fd")).as("__life"),
        when(col("__cd").isNotNull, 1L).otherwise(0L).as("__churn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization (30 min), per-session rollup.
    "q15_sessionize" -> ((s, dir) => {
      Sessionize.sessionStats(
          t(s, dir), col("user_id"), col("ts"), dec(col("value")), gapSeconds = 1800)
        .select(col("key").as("user_id"), col("session_seq"),
          col("n_events"),
          tstr(col("session_start")).as("session_start"),
          tstr(col("session_end")).as("session_end"),
          col("value_sum").cast("double").as("value_sum"))
    }),

    // Tumbling 1-hour windows (batch analog of window(ts, '1 hour')).
    "q16_tumbling_hour" -> ((s, dir) => {
      t(s, dir)
        .groupBy(tstr(date_trunc("hour", col("ts"))).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("value_sum"))
    }),

    // A4 status summary: error/ok counts → derived status + summary string.
    "q17_status_summary" -> ((s, dir) => {
      t(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "error", 1)).as("n_err"),
          count(when(col("event_type") =!= "error", 1)).as("n_ok"))
        .withColumn("status",
          when(col("n_err") === 0, "success")
            .when(col("n_ok") === 0, "failed")
            .otherwise("partial_success"))
        .withColumn("summary",
          concat(col("n_ok").cast("string"), lit(" ok, "),
            col("n_err").cast("string"), lit(" err")))
    }),

    // A6/W5 first event per user.
    "q18_first_event" -> ((s, dir) => {
      Ranking.keepFirst(t(s, dir), Seq(col("user_id")),
          Seq(col("ts").asc, col("event_id").asc))
        .select(col("user_id"), col("event_id"), col("event_type"),
          tstr(col("ts")).as("first_ts"))
    }),

    // Lag analytics: inter-event gap stats per user.
    "q19_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir)
        .withColumn("gap", unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .filter(col("gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          round(avg(col("gap")), 4).as("avg_gap"),
          max(col("gap")).as("max_gap"))
    }),

    // F11 JSON property extraction + aggregation.
    "q20_json_props" -> ((s, dir) => {
      t(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"), max(col("k")).as("max_k"))
    }),

    // SCD Type-2 history: every event versions its user's event_type
    // attribute — effective_from = event ts, effective_to = next version's
    // ts (event_id tiebreak), open interval on the latest.
    "q143_scd2_history" -> ((s, dir) => {
      graft.operators.ChangeLog.scd2(
          t(s, dir).select(col("user_id"), col("event_id"), col("ts"),
            col("event_type")),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("event_type"),
          tstr(col("effective_from")).as("effective_from"),
          coalesce(tstr(col("effective_to")), lit("")).as("effective_to"),
          col("is_current").cast("int").as("is_current"))
    }),

    // Kaplan–Meier time-to-conversion curve per first-touch cohort:
    // subject = user, duration = days to the first HIGH-VALUE purchase
    // (censored at last activity when none — the q200 life-table
    // shape, estimator now ON the hash surface). The survival product
    // is carried EXACTLY in log2 fixed point (the q278/q280 staged-LUT
    // convention), so the curve replays bit-for-bit in the oracle.
    "q290_kaplan_meier" -> ((s, dir) => {
      Journey.kaplanMeier(kmSubjects(s, dir), Seq(col("__cohort")),
          col("__life"), col("__churn"))
        .select(col("g0").as("cohort"), col("t"), col("n_risk"),
          col("d_events"), col("c_censored"), col("extinct"),
          col("survival_bits"))
    }),

    // Log-rank battery — q290's paired significance gate, one-vs-rest
    // per first-touch cohort: does cohort X convert on a DIFFERENT
    // clock than everyone else? Subjects replicate across the (≤5)
    // cohort labels (broadcast), arm A = "is this cohort"; every E/V
    // term micro-rounded once, chi² vs the baked chi²(1) critical in
    // cross-multiplied integers.
    "q294_logrank" -> ((s, dir) => {
      // checkpointed: referenced by the label dim AND the battery (the
      // q152 double-execution rule)
      val subj = kmSubjects(s, dir).localCheckpoint()
      val labels = subj.select(col("__cohort").as("__lab")).distinct()
      // fail-loud cardinality cap (the blockedUnits maxGroups
      // convention): the battery replicates EVERY subject across all
      // labels, so a cohort-column regression to high cardinality must
      // surface as an error, not a subjects x labels blowup
      val maxLabels = 64
      val nLabels = labels.take(maxLabels + 1).length
      require(nLabels <= maxLabels,
        s"q294_logrank one-vs-rest battery caps cohort labels at " +
          s"$maxLabels (subjects replicate across labels); got > " +
          s"$maxLabels distinct values")
      Journey.logRank(subj.crossJoin(broadcast(labels)),
          Seq(col("__lab")), col("__cohort") === col("__lab"),
          col("__life"), col("__churn"))
        .select(col("g0").as("cohort"), col("n_times"), col("o_a"),
          col("e_a"), col("o_b"), col("e_b"), col("chi2"),
          col("significant"))
    }),

    // Benjamini–Hochberg FDR over the q294 battery: m one-vs-rest
    // tests at per-test α = 0.05 expect m·0.05 false alarms — BH caps
    // the false discovery rate at 0.05 instead. Rank the cohorts'
    // chi² statistics descending (p ascending) and reject ranks 1..k*,
    // k* = max{k : chi2_(k) ≥ baked F⁻¹(1 − 0.05·k/m)} — the
    // p-value-free chi²-scale step-up; grid + pinned contract in
    // TableOps.bhFdr (both engines read the SAME generated VALUES).
    "q297_logrank_bh" -> ((s, dir) => {
      val subj = kmSubjects(s, dir).localCheckpoint()
      val labels = subj.select(col("__cohort").as("__lab")).distinct()
      val maxLabels = 16 // the bhFdr baked-grid envelope
      val nLabels = labels.take(maxLabels + 1).length
      require(nLabels <= maxLabels,
        s"q297_logrank_bh battery caps cohort labels at $maxLabels " +
          s"(the baked BH critical grid); got > $maxLabels")
      val bat = Journey.logRank(subj.crossJoin(broadcast(labels)),
          Seq(col("__lab")), col("__cohort") === col("__lab"),
          col("__life"), col("__churn"))
        .filter(col("chi2").isNotNull)
        // micro statistic reconstructed exactly: chi2 is micro/1e6, the
        // same IEEE double both engines, within ~1e-9 of the integer
        .select(col("g0"), round(col("chi2") * 1e6).cast("long").as("__stat"))
      graft.operators.TableOps.bhFdr(bat, Seq(col("g0")), col("__stat"))
        .withColumnRenamed("g0", "cohort")
    }),

    // Interval-join attribution (the batch form of StreamingOps
    // .intervalJoin — StreamingSpec pins the SAME plan stream ≡ batch):
    // every (click, purchase) pair of the same user with the purchase
    // inside [click, click + 30 min], both bounds inclusive — ALL pairs
    // in the horizon, where q199's as-of join keeps only the latest
    // click. Rolled up per user to keep the surface bounded.
    "q299_interval_join" -> ((s, dir) => {
      val e = t(s, dir).filter(col("ts").isNotNull)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      graft.streaming.StreamingOps.intervalJoin(clicks, purchases,
          "c_user", "p_user", "c_ts", "p_ts", "30 minutes")
        .groupBy(col("c_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("p_id")).as("n_purchases"),
          countDistinct(col("c_id")).as("n_clicks"))
    }),

    // U-shaped multi-touch attribution: purchases convert; each
    // converted user's pre-conversion touches share 1,000,000 micro
    // credits 40/20/40 (first/middles/last), remainders to the earliest
    // middle — exact integers, Σ per user = 1e6 by construction.
    "q291_attribution_u" -> ((s, dir) => {
      Journey.attributionUShaped(t(s, dir), col("user_id"), col("ts"),
        col("event_id"), col("event_type"),
        col("event_type") === "purchase")
    }))

  /** The q290/q294 subject chain as ONE shared oracle fragment (the
    * log2fpStages/cmDdSql extraction convention): produces `kmsubj`
    * with (cohort, t, ev). Null-cohort subjects (first touch has a
    * null event_type) are EXCLUDED — mirrors kmSubjects' filter; a
    * null arm in the log-rank battery would otherwise diverge between
    * the engines (Spark's null comparison drops the subject, SQL's
    * CASE would bucket it into arm B).
    */
  private val kmSubjectsSql: String =
    """e AS (SELECT user_id, event_type, event_id, ts, value,
             CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS day
           FROM events WHERE ts IS NOT NULL),
         pu AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld,
             MIN(CASE WHEN event_type = 'purchase' AND
               CAST(value AS DECIMAL(18,2)) * 100 >= 5000
               THEN day END) AS cd
           FROM e GROUP BY 1),
         ft AS (SELECT user_id, event_type AS cohort FROM (
             SELECT user_id, event_type, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM e) WHERE rn = 1),
         kmsubj AS (SELECT ft.cohort, COALESCE(pu.cd, pu.ld) - pu.fd AS t,
             CASE WHEN pu.cd IS NOT NULL THEN 1 ELSE 0 END AS ev
           FROM pu JOIN ft USING (user_id)
           WHERE ft.cohort IS NOT NULL)"""

  /** The q294/q297 one-vs-rest log-rank battery through its `ag`
    * rollup (per-label O/E/V micro sums) — ONE definition feeds the
    * battery's verdict query AND the BH step-up on top of it (the
    * kmSubjectsSql extraction convention). */
  private val logRankBatterySql: String =
    s"""$kmSubjectsSql,
         labs AS (SELECT DISTINCT cohort AS lab FROM kmsubj),
         subj AS (SELECT lab,
             CASE WHEN cohort = lab THEN 1 ELSE 0 END AS arm, t, ev
           FROM kmsubj, labs),
         cell AS (SELECT lab, t,
             CAST(SUM(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
               AS da,
             CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
               AS db,
             CAST(SUM(arm) AS BIGINT) AS ca,
             CAST(SUM(1 - arm) AS BIGINT) AS cb
           FROM subj GROUP BY 1, 2),
         st AS (SELECT lab, t, da, db,
             CAST(SUM(ca) OVER (PARTITION BY lab ORDER BY t
               ROWS BETWEEN CURRENT ROW AND
               UNBOUNDED FOLLOWING) AS BIGINT) AS na,
             CAST(SUM(cb) OVER (PARTITION BY lab ORDER BY t
               ROWS BETWEEN CURRENT ROW AND
               UNBOUNDED FOLLOWING) AS BIGINT) AS nb
           FROM cell),
         tm AS (SELECT lab, t, da, db, na, nb, da + db AS d, na + nb AS n
           FROM st WHERE da + db > 0),
         mr AS (SELECT lab, t, da, db,
             CAST((2 * CAST(na AS HUGEINT) * d * 1000000 + n) // (2 * n)
               AS BIGINT) AS ea,
             CAST((2 * CAST(nb AS HUGEINT) * d * 1000000 + n) // (2 * n)
               AS BIGINT) AS eb,
             CASE WHEN n > 1 THEN CAST(
                 (2 * CAST(d AS HUGEINT) * (n - d) * na * nb * 1000000 +
                   CAST(n AS HUGEINT) * n * (n - 1)) //
                 (2 * CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT)
               ELSE 0 END AS v
           FROM tm),
         ag AS (SELECT lab, COUNT(*) AS n_times,
             CAST(SUM(da) AS BIGINT) AS o_a,
             CAST(SUM(db) AS BIGINT) AS o_b,
             CAST(SUM(ea) AS HUGEINT) AS sea,
             CAST(SUM(eb) AS HUGEINT) AS seb,
             CAST(SUM(da * 1000000 - ea) AS HUGEINT) AS u,
             CAST(SUM(v) AS HUGEINT) AS sv
           FROM mr GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    "q143_scd2_history" ->
      """WITH v AS (
           SELECT user_id, event_id, event_type, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events)
         SELECT user_id, event_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS effective_from,
           COALESCE(STRFTIME(nxt, '%Y-%m-%d %H:%M:%S'), '') AS effective_to,
           CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
         FROM v""",
    "q15_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS nw
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT user_id, ts, value,
             CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           FROM x)
         SELECT user_id, session_seq, COUNT(*) AS n_events,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
         FROM sess GROUP BY user_id, session_seq""",
    "q16_tumbling_hour" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
         FROM events GROUP BY 1, 2""",
    "q17_status_summary" ->
      """SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_err,
           COUNT(*) FILTER (WHERE event_type <> 'error') AS n_ok,
           CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error') = 0 THEN 'success'
                WHEN COUNT(*) FILTER (WHERE event_type <> 'error') = 0 THEN 'failed'
                ELSE 'partial_success' END AS status,
           (COUNT(*) FILTER (WHERE event_type <> 'error')) || ' ok, ' ||
             (COUNT(*) FILTER (WHERE event_type = 'error')) || ' err' AS summary
         FROM events GROUP BY user_id""",
    "q18_first_event" ->
      """SELECT user_id, event_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
         FROM (SELECT *, ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
         WHERE rn = 1""",
    "q19_lag_delta" ->
      """WITH g AS (
           SELECT user_id,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) -
               CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap
           FROM events)
         SELECT user_id, COUNT(*) AS n_gaps, ROUND(AVG(gap), 4) AS avg_gap,
           MAX(gap) AS max_gap
         FROM g WHERE gap IS NOT NULL GROUP BY user_id""",
    "q20_json_props" ->
      """SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
         FROM events GROUP BY event_type""",
    "q290_kaplan_meier" ->
      s"""WITH $kmSubjectsSql,
         cell AS (SELECT cohort, t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c FROM kmsubj GROUP BY 1, 2),
         st AS (SELECT cohort, t, d, c,
             CAST(SUM(d + c) OVER (PARTITION BY cohort ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n
           FROM cell),
         ${Log2Fixed.lutCteSql},
         ${CurationQueries.log2fpStages("st", "cohort, t, d, c, n",
          "GREATEST(n - d, 1)", "lgnd", "p1")},
         ${CurationQueries.log2fpStages("p1l", "cohort, t, d, c, n, lgnd",
          "n", "lgn", "p2")},
         fin AS (SELECT cohort, t, n, d, c,
             CAST(SUM(CASE WHEN d > 0 AND n > d THEN lgnd - lgn ELSE 0 END)
               OVER (PARTITION BY cohort ORDER BY t ROWS UNBOUNDED
                 PRECEDING) AS BIGINT) AS bits,
             MAX(CASE WHEN d > 0 AND d = n THEN 1 ELSE 0 END)
               OVER (PARTITION BY cohort ORDER BY t ROWS UNBOUNDED
                 PRECEDING) AS ext
           FROM p2l)
         SELECT cohort, t, n AS n_risk, d AS d_events, c AS c_censored,
           CAST(ext AS INT) AS extinct,
           CASE WHEN ext = 0 THEN CAST(bits AS DOUBLE) / 1048576 END
             AS survival_bits
         FROM fin""",
    "q294_logrank" ->
      s"""WITH $logRankBatterySql
         SELECT lab AS cohort, n_times, o_a,
           CAST(sea AS BIGINT) / 1000000.0 AS e_a,
           o_b, CAST(seb AS BIGINT) / 1000000.0 AS e_b,
           CASE WHEN sv > 0 THEN
               CAST((2 * u * u * 1000000 + sv * 1000000) //
                 (2 * sv * 1000000) AS BIGINT) / 1000000.0
             END AS chi2,
           CASE WHEN sv > 0 THEN
               CAST(CASE WHEN u * u > sv * 3841459 THEN 1 ELSE 0 END
                 AS INT)
             END AS significant
         FROM ag WHERE n_times > 0""",
    "q297_logrank_bh" ->
      s"""WITH $logRankBatterySql,
         chi AS (SELECT lab, CAST((2 * u * u * 1000000 + sv * 1000000)
               // (2 * sv * 1000000) AS BIGINT) AS cmu
           FROM ag WHERE n_times > 0 AND sv > 0),
         mm AS (SELECT CAST(COUNT(*) AS INT) AS m FROM chi),
         rk AS (SELECT lab, cmu, CAST(ROW_NUMBER() OVER (
             ORDER BY cmu DESC, lab) AS INT) AS r FROM chi),
         crit(cm, ck, cc) AS (VALUES ${
             graft.operators.TableOps.bhCriticalSql}),
         j AS (SELECT rk.lab, rk.cmu, mm.m, rk.r, crit.cc
           FROM rk CROSS JOIN mm
           JOIN crit ON crit.cm = mm.m AND crit.ck = rk.r),
         ks AS (SELECT MAX(CASE WHEN cmu >= cc THEN r END) AS kstar
           FROM j)
         SELECT lab AS cohort, cmu / 1000000.0 AS chi2, m, r AS rank,
           cc / 1000000.0 AS critical,
           CAST(CASE WHEN r <= COALESCE(kstar, 0) THEN 1 ELSE 0 END
             AS INT) AS rejected
         FROM j CROSS JOIN ks""",
    "q299_interval_join" ->
      """WITH c AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click' AND ts IS NOT NULL),
         p AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase' AND ts IS NOT NULL),
         j AS (SELECT c.user_id, c.event_id AS cid, p.event_id AS pid
           FROM c JOIN p ON p.user_id = c.user_id
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
         SELECT user_id, COUNT(*) AS n_pairs,
           COUNT(DISTINCT pid) AS n_purchases,
           COUNT(DISTINCT cid) AS n_clicks
         FROM j GROUP BY 1""",
    "q291_attribution_u" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts
           FROM events WHERE ts IS NOT NULL),
         cv AS (SELECT user_id, ts AS cts, event_id AS cid FROM (
             SELECT user_id, ts, event_id, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM e WHERE event_type = 'purchase') WHERE rn = 1),
         tc AS (SELECT e.user_id, e.event_type AS channel,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
               ORDER BY e.ts, e.event_id) AS i,
             COUNT(*) OVER (PARTITION BY e.user_id) AS m
           FROM e JOIN cv USING (user_id)
           WHERE e.event_type <> 'purchase'
             AND (e.ts < cv.cts
               OR (e.ts = cv.cts AND e.event_id < cv.cid))),
         cr AS (SELECT channel, i, m,
             CASE WHEN m = 1 THEN 1000000
                  WHEN m = 2 THEN 500000
                  WHEN i = 1 OR i = m THEN 400000
                  WHEN i = 2 THEN 200000 // (m - 2) + 200000 % (m - 2)
                  ELSE 200000 // (m - 2) END AS credit
           FROM tc)
         SELECT channel, CAST(SUM(credit) AS BIGINT) AS credit_micro,
           COUNT(*) AS n_touches,
           CAST(SUM(CASE WHEN i = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_first,
           CAST(SUM(CASE WHEN i = m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_last
         FROM cr GROUP BY 1""")
}
