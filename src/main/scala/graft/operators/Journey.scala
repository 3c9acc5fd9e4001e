package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-journey analytics: funnel progression, cohort retention, and
  * time-grid resampling with forward fill — the batch analytics a
  * product-event warehouse runs over the same `events` shape the
  * streaming layer ingests (SURVEY.md §2.9's table).
  *
  * Scale posture (100 TB events):
  *  - [[funnel]] is ONE shuffle on the user key; per-user state is that
  *    user's funnel-stage events only (collect_list bounded by per-user
  *    activity, the same bound any sessionizer pays), folded with a
  *    codegen'd `aggregate` HOF — no iterative joins, no driver state.
  *    The k-stage chained-min semantics (earliest stage-i event strictly
  *    after the reached stage-(i-1) time, inside the anchor window) is
  *    what a per-user time-sorted greedy fold computes exactly.
  *  - [[cohortRetention]] is a window-min plus a distinct — two exchanges
  *    on the user key, output bounded by cohorts × offsets.
  *  - [[resampleFfill]] explodes a per-key time grid bounded by
  *    (time-range / step), never by event count; the forward fill is a
  *    running `last(ignoreNulls)` frame, no self-join.
  */
object Journey {

  import EvalMetrics.dec

  /** Per-user funnel progression over `stages` (ordered event-type names).
    *
    * Semantics (the chained-min form, replayable as SQL joins): the
    * anchor t₁ = earliest stage-1 event; tᵢ = earliest stage-i event with
    * tᵢ > tᵢ₋₁ and tᵢ ≤ t₁ + windowSeconds. Output: one row per user
    * that reached at least stage 1 — (user, depth, anchor_us) where
    * depth ∈ [1, stages.length].
    */
  def funnel(
      events: DataFrame,
      user: Column,
      ts: Column,
      stage: Column,
      stages: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct, got $stages")
    val k = stages.length
    val winUs = windowSeconds * 1000000L
    // stage → 0-based index; non-funnel events dropped before the shuffle
    val si = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (name, i)) =>
      when(stage === name, lit(i)).otherwise(acc)
    }
    // null timestamps drop like the chained-min SQL form ignores them —
    // a null anchor would otherwise poison every later ts comparison
    val evs = events
      .select(user.as("user_key"),
        unix_micros(ts).as("ts_us"), si.as("si"))
      .filter(col("si") >= 0 && col("ts_us").isNotNull)
    // One shuffle: per-user sorted fold. struct sort = (ts_us, si) lexical,
    // so the scan sees time order; strict `>` in the advance condition
    // makes the tiebreak irrelevant for progression.
    val folded = evs
      .groupBy(col("user_key"))
      .agg(sort_array(collect_list(struct(col("ts_us"), col("si")))).as("evs"))
      .select(col("user_key"),
        aggregate(col("evs"),
          lit(Array.empty[Long]).cast("array<bigint>"),
          (acc, e) => {
            val advance = size(acc) < k && e.getField("si") === size(acc) &&
              (size(acc) === 0 ||
                (e.getField("ts_us") > element_at(acc, -1) &&
                  e.getField("ts_us") <= element_at(acc, 1) + winUs))
            when(advance, concat(acc, array(e.getField("ts_us")))).otherwise(acc)
          }).as("reached"))
    folded
      .filter(size(col("reached")) > 0)
      .select(col("user_key"),
        size(col("reached")).cast("int").as("depth"),
        element_at(col("reached"), 1).as("anchor_us"))
  }

  /** Funnel depth rows → per-stage report: (stage_no, stage, n_users,
    * pct_of_first). The k-row result joins its own stage-1 count via a
    * one-row broadcast, never a single-partition window.
    */
  def funnelReport(depths: DataFrame, stages: Seq[String]): DataFrame = {
    val names = lit(stages.toArray)
    val counts = depths
      .select(explode(sequence(lit(1), col("depth"))).as("stage_no"))
      .groupBy(col("stage_no")).agg(count(lit(1)).as("n_users"))
    val first = counts.filter(col("stage_no") === 1)
      .select(col("n_users").as("__n1"))
    counts.crossJoin(broadcast(first))
      .select(col("stage_no"),
        element_at(names, col("stage_no")).as("stage"),
        col("n_users"),
        round(col("n_users") / col("__n1").cast("double"), 4).as("pct_of_first"))
  }

  /** Weekly cohort retention: cohort = week of a user's first event,
    * offset = whole weeks since the cohort week; output
    * (cohort_week, week_offset, n_users) with distinct users per cell.
    */
  def cohortRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val w = Window.partitionBy(col("user_key"))
    events
      .select(user.as("user_key"), date_trunc("week", ts).as("wk"))
      .withColumn("cohort", min(col("wk")).over(w))
      .select(col("user_key"), col("cohort"), col("wk"))
      .distinct()
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-key ordered event-sequence string — the MATCH_RECOGNIZE-lite
    * substrate: each event renders to one symbol (via `symbol`, e.g. the
    * event-type initial), symbols concatenate in (ts, tiebreak) order,
    * and sequence patterns become ordinary regexes over the per-key
    * string. ONE shuffle on the key; per-key state = that key's own
    * events (the sessionizer bound). Null timestamps drop.
    *
    * @return (key, seq, n_events)
    */
  def eventSequence(
      events: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      symbol: Column): DataFrame =
    events
      .select(key.as("key"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), symbol.as("__sym"))
      .filter(col("__t").isNotNull)
      .groupBy(col("key"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("__t"), col("__tb"), col("__sym")))),
          e => e.getField("__sym")), "").as("seq"),
        count(lit(1)).as("n_events"))

  /** First-order Markov transition matrix of the event stream: counts and
    * probabilities of (previous symbol -> next symbol) over per-key
    * (ts, tiebreak)-ordered events — the "what do users do next" table
    * behind next-action prediction and anomalous-flow detection.
    * Probabilities are exact-integer micro-rounded per source symbol.
    *
    * Scale posture: one key-partitioned lag window (the only row-weight
    * exchange), then transition counts collapse to the (alphabet x
    * alphabet)-bounded table; per-source totals ride a broadcast join
    * over that table (checkpointed — it feeds counts and totals).
    *
    * @return (prev_type, next_type, n_trans, p) — p 6dp
    */
  def markovTransitions(
      events: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      symbol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = events
      .select(key.as("__k"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), symbol.as("__sym"))
      .filter(col("__t").isNotNull)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tb"))
    val tr = seq.withColumn("__prev", lag(col("__sym"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col("__sym").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
      .localCheckpoint()
    val totals = tr.groupBy(col("prev_type"))
      .agg(sum(col("n_trans")).as("__tot"))
    tr.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        (EvalMetrics.microRound6(col("n_trans"), col("__tot"))
          .cast("double") / 1e6).as("p"))
  }

  /** Lagged cross-correlation profile of two integer series sharing a
    * time index: for each lag in [0, maxLag], Pearson r^2 between
    * x(t) and y(t + lag) over the pairs where both exist — r^2 because
    * it clears the square roots: r^2 = cov^2 / (varX * varY) with
    * cov = n*Sxy - Sx*Sy etc., an exact integer rational (a float
    * Pearson would never hash-match); the correlation's direction is
    * `cov_sign`. Null r^2 when either variance is 0 or n < 2.
    *
    * Scale posture: the lag fan-out is a generator on one side
    * (maxLag+1 copies), then ONE time-keyed equi-join; per-lag sums are
    * (maxLag+1)-bounded. Products widen to DECIMAL(38,0) before
    * squaring — cov^2 wraps a long at daily counts ~1e5. Envelope:
    * cov^2 and varX*varY must fit 38 digits (|cov| < ~1e16, i.e.
    * n * value^2 < ~1e16) — pre-scale coarser series units beyond.
    *
    * @param df one row per time point: (tCol ascending integer index,
    *   xCol, yCol integer values)
    * @return (lag, n_pairs, cov_sign, r2)
    */
  def lagCorrelation(df: DataFrame, tCol: Column, xCol: Column,
      yCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    import EvalMetrics.dec
    val base = df.select(tCol.cast("long").as("__t"),
      xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .localCheckpoint() // both join sides read it
    val xs = base.select(col("__t"), col("__x"))
    val ys = base.select(col("__t").as("__ty"), col("__y"))
      .withColumn("lag", explode(sequence(lit(0), lit(maxLag))))
      .select((col("__ty") - col("lag")).as("__t"), col("lag"), col("__y"))
    val sums = xs.join(ys, Seq("__t"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("__x"))).as("sx"), sum(dec(col("__y"))).as("sy"),
        // per-factor widening (the HUGEINT twin's CAST-before-multiply):
        // a long x*y wraps at |x| ~ 3e9 — ANSI would throw, DECIMAL stays exact
        sum(dec(col("__x")) * dec(col("__y"))).as("sxy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("sxx"),
        sum(dec(col("__y")) * dec(col("__y"))).as("syy"))
    val cov = col("n_pairs") * col("sxy") - col("sx") * col("sy")
    val vx = col("n_pairs") * col("sxx") - col("sx") * col("sx")
    val vy = col("n_pairs") * col("syy") - col("sy") * col("sy")
    sums.select(col("lag").cast("long").as("lag"), col("n_pairs"),
      when(cov > 0, 1).when(cov < 0, -1).otherwise(0).as("cov_sign"),
      when(col("n_pairs") >= 2 && vx > 0 && vy > 0,
        EvalMetrics.microRound6(cov * cov, vx * vy).cast("double") / 1e6)
        .as("r2"))
  }

  /** Per-key exponentially weighted moving average in fixed point:
    * `ewma' = (x·2²⁰ + (d−1)·ewma) div d` over (ts, tiebreak)-ordered
    * values, seeded with the first value. Integer end to end — the
    * recursion replays exactly cross-engine (a float EWMA would drift).
    * One shuffle on the key, `aggregate`-fold like [[funnel]].
    *
    * @param d smoothing denominator (α = 1/d)
    * @return (key, n, ewma_fp) — ewma_fp scaled by 2²⁰
    */
  def ewmaFixed(
      events: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      value: Column,
      d: Int): DataFrame = {
    require(d >= 2, s"smoothing denominator must be >= 2: $d")
    val scaled = events
      .select(key.as("key"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), value.cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull)
    // explicit seeded flag, NOT a sentinel value: a first value of
    // exactly -2^43 would quantize to Long.MinValue and a sentinel
    // check would silently re-seed mid-series (diverging from the
    // sentinel-free oracle); the flag costs one boolean in the fold
    scaled
      .groupBy(col("key"))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("__t"), col("__tb"), col("__x")))),
          struct(lit(0L).as("v"), lit(false).as("seeded")),
          (acc, e) => {
            val xq = e.getField("__x") * (1L << 20)
            when(!acc.getField("seeded"),
              struct(xq.as("v"), lit(true).as("seeded")))
              .otherwise(struct(
                expr_div(xq + acc.getField("v") * (d - 1), d).as("v"),
                lit(true).as("seeded")))
          },
          acc => acc.getField("v")).as("ewma_fp"),
        count(lit(1)).as("n"))
  }

  /** Per-key Holt double-exponential smoothing in fixed point — the
    * trend companion to [[ewmaFixed]] (level-only) the forecasting
    * family lacked: EWMA tracks a level, Holt tracks level AND slope, so
    * a steadily-growing series forecasts ahead instead of lagging.
    *
    *   level' = (x·2²⁰ + (da−1)·(level + trend)) fdiv da   (α = 1/da)
    *   trend' = ((level' − level) + (db−1)·trend) fdiv db  (β = 1/db)
    *
    * seeded (level = x₁·2²⁰, trend = 0). The trend (and hence the level
    * numerator) goes NEGATIVE on declining series even when every x is
    * positive, so the division sign convention is part of the contract:
    * both steps use TRUNCATING division (the [[ewmaFixed]] `%` idiom),
    * which is what DuckDB's integer `//` does (verified: −7 // 2 = −3)
    * and what a Scala reference fold's `/` does. Integer end to end:
    * the recursion replays exactly cross-engine — q254's oracle replays
    * it as a RECURSIVE CTE over per-key event ranks, deliberately NOT a
    * list_reduce (DuckDB 1.0 aliases a multi-field struct accumulator
    * in place: a later struct_pack field reads an earlier field's fresh
    * output, silently corrupting any struct-state lambda fold). One
    * shuffle on the key, (ts, tiebreak)-ordered fold
    * like [[funnel]]/[[ewmaFixed]]; per-key series bounded by contract
    * (the q190 grain).
    *
    * Envelope: every intermediate is a long — with |x| < 2^40 the worst
    * numerator |x·2²⁰·(1 + (da−1))| stays under 2^63 for da, db ≤ 16;
    * past that the session's ANSI arithmetic (Spark 4 default, never
    * disabled by GraftSession) fails loud, matching the oracle's BIGINT
    * overflow — neither engine wraps silently.
    *
    * @param da level denominator (α = 1/da); db trend denominator
    * @return (key, n, level_fp, trend_fp, forecast_fp = level + trend),
    *   all scaled by 2²⁰
    */
  def holtFixed(
      events: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      value: Column,
      da: Int,
      db: Int): DataFrame = {
    require(da >= 2 && db >= 2, s"denominators must be >= 2: $da, $db")
    def fdiv(a: Column, d: Int): Column = expr_div(a, d.toLong)
    val scaled = events
      .select(key.as("key"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), value.cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull)
    // explicit seeded flag, NOT a sentinel (the ewmaFixed rationale: a
    // legitimate level of exactly Long.MinValue must not re-seed)
    scaled
      .groupBy(col("key"))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("__t"), col("__tb"), col("__x")))),
          struct(lit(0L).as("l"), lit(0L).as("b"), lit(false).as("seeded")),
          (acc, e) => {
            val xq = e.getField("__x") * (1L << 20)
            val l0 = acc.getField("l")
            val b0 = acc.getField("b")
            val l1 = fdiv(xq + (l0 + b0) * (da - 1), da)
            val b1 = fdiv((l1 - l0) + b0 * (db - 1), db)
            when(!acc.getField("seeded"),
              struct(xq.as("l"), lit(0L).as("b"), lit(true).as("seeded")))
              .otherwise(
                struct(l1.as("l"), b1.as("b"), lit(true).as("seeded")))
          }).as("__st"),
        count(lit(1)).as("n"))
      .select(col("key"), col("n"),
        col("__st.l").as("level_fp"), col("__st.b").as("trend_fp"),
        (col("__st.l") + col("__st.b")).as("forecast_fp"))
  }

  /** Per-key Holt–Winters ADDITIVE triple-exponential smoothing in fixed
    * point — the seasonality member completing the forecasting family
    * (EWMA = level, [[holtFixed]] = level+trend, this = level+trend+
    * period-p seasonal components):
    *
    *   j      = (t−1) mod p                    (0-based seasonal slot)
    *   level' = ((x·2²⁰ − s[j]) + (da−1)·(level+trend)) tdiv da
    *   trend' = ((level' − level) + (db−1)·trend)       tdiv db
    *   s[j]'  = ((x·2²⁰ − level') + (dc−1)·s[j])        tdiv dc
    *
    * seeded (level = x₁·2²⁰, trend = 0, s = 0ᵖ) — the zero seasonal
    * seed keeps the recursion a pure deterministic function of the
    * series (no within-period averaging variant to disagree about);
    * early steps behave like Holt and the seasonal vector absorbs the
    * residual pattern as slots revisit. All divisions TRUNCATING
    * ([[holtFixed]]'s contract — components go negative freely). The
    * oracle replays it as a recursive CTE carrying the seasonal LIST
    * per state row (q256; the q254 recursive-CTE discipline — never a
    * struct-state list_reduce). Envelope: |x| < 2^40 as in
    * [[holtFixed]]; ANSI fails loud on both engines past it.
    *
    * @return (key, n, level_fp, trend_fp, season_fp, forecast_fp) —
    *   season_fp is the slot the NEXT step would use (j = n mod p) and
    *   forecast_fp = level + trend + season, all scaled by 2²⁰
    */
  def holtWintersFixed(
      events: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      value: Column,
      period: Int,
      da: Int,
      db: Int,
      dc: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    require(da >= 2 && db >= 2 && dc >= 2,
      s"denominators must be >= 2: $da, $db, $dc")
    def fdiv(a: Column, d: Int): Column = expr_div(a, d.toLong)
    val scaled = events
      .select(key.as("key"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), value.cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull)
    scaled
      .groupBy(col("key"))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("__t"), col("__tb"), col("__x")))),
          struct(lit(0L).as("l"), lit(0L).as("b"),
            array_repeat(lit(0L), period).as("s"),
            lit(0L).as("i"), lit(false).as("seeded")),
          (acc, e) => {
            val xq = e.getField("__x") * (1L << 20)
            val l0 = acc.getField("l")
            val b0 = acc.getField("b")
            val s0 = acc.getField("s")
            val i0 = acc.getField("i")
            // slot for position t = i0+1 is (t−1) mod p = i0 mod p
            val j = pmod(i0, lit(period.toLong))
            val sj = element_at(s0, (j + 1).cast("int"))
            val l1 = fdiv((xq - sj) + (l0 + b0) * (da - 1), da)
            val b1 = fdiv((l1 - l0) + b0 * (db - 1), db)
            val sn = fdiv((xq - l1) + sj * (dc - 1), dc)
            val s1 = transform(s0, (v, idx) =>
              when(idx.cast("long") === j, sn).otherwise(v))
            when(!acc.getField("seeded"),
              struct(xq.as("l"), lit(0L).as("b"),
                array_repeat(lit(0L), period).as("s"),
                lit(1L).as("i"), lit(true).as("seeded")))
              .otherwise(struct(l1.as("l"), b1.as("b"), s1.as("s"),
                (i0 + 1).as("i"), lit(true).as("seeded")))
          }).as("__st"),
        count(lit(1)).as("n"))
      .select(col("key"), col("n"),
        col("__st.l").as("level_fp"), col("__st.b").as("trend_fp"),
        element_at(col("__st.s"),
          (pmod(col("__st.i"), lit(period.toLong)) + 1).cast("int"))
          .as("season_fp"))
      .withColumn("forecast_fp",
        col("level_fp") + col("trend_fp") + col("season_fp"))
  }

  /** Wald SPRT constants in 2²⁰ fixed-point bits — the baked-integer
    * contract (the chi²-critical convention): l1 = lg(p1/p0) > 0 per
    * success, l0 = lg((1−p1)/(1−p0)) < 0 per failure, bound =
    * lg((1−β)/α) with the symmetric lower bound −bound. ONE definition
    * feeds the operator call and the oracle's embedded literals.
    */
  def sprtConstants(p0: Double, p1: Double, alpha: Double,
      beta: Double): (Long, Long, Long) = {
    require(p0 > 0 && p0 < p1 && p1 < 1, s"need 0 < p0 < p1 < 1: $p0, $p1")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"need alpha, beta in (0, 0.5): $alpha, $beta")
    def fp(x: Double) = math.round(x / math.log(2) * (1L << 20))
    (fp(math.log(p1 / p0)), fp(math.log((1 - p1) / (1 - p0))),
      fp(math.log((1 - beta) / alpha)))
  }

  /** Sequential probability ratio test (Wald 1945), replayed over a
    * time-ordered Bernoulli stream per group — the "stop the experiment
    * as soon as the evidence clears the bar" audit: at every event the
    * cumulative log-likelihood ratio moves +l1 on success / l0 on
    * failure, and the FIRST crossing of ±bound decides (≥ +bound →
    * accept p1, ≤ −bound → accept p0); a stream that never crosses
    * reads `continue`. Everything integer: the three constants arrive
    * as baked 2²⁰-bit longs ([[sprtConstants]] — generated once for
    * operator and oracle), the running LLR is a plain windowed sum,
    * and the displayed bits divide by 2²⁰ (exact doubles ≤ 2⁵³).
    *
    * Scale posture: ONE group-keyed ordered window (running sum + row
    * number) and a group-bounded aggregate + one join back for the
    * crossing row; null-timestamp rows are dropped like [[cusum]].
    *
    * @return (g…, n_events, n_success, decision, n_at_decision,
    *         llr_at_decision_bits, llr_final_bits)
    */
  def sprt(events: DataFrame, groupCols: Seq[Column], ts: Column,
      tiebreak: Column, successCol: Column, l1Fp: Long, l0Fp: Long,
      boundFp: Long): DataFrame = {
    require(groupCols.nonEmpty, "sprt needs >= 1 group column")
    require(l1Fp > 0 && l0Fp < 0 && boundFp > 0,
      s"need l1 > 0, l0 < 0, bound > 0: $l1Fp, $l0Fp, $boundFp")
    import org.apache.spark.sql.expressions.Window
    val base = events
      .filter(ts.isNotNull && successCol.isNotNull)
      .select((groupCols ++ Seq(unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), successCol.cast("long").as("__s"))): _*)
    val gNames = base.columns.dropRight(3).toSeq
    val w = Window.partitionBy(gNames.map(col): _*)
      .orderBy(col("__t"), col("__tb"))
    val stepped = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__llr", sum(
        when(col("__s") === 1, l1Fp).otherwise(l0Fp))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // consumed by the rollup AND the crossing join
    val rolled = stepped.groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("__s")).as("n_success"),
        max(struct(col("__rn"), col("__llr"))).as("__last"),
        min(when(abs(col("__llr")) >= boundFp, col("__rn")))
          .as("n_at_decision"))
    val atDecision = stepped.select(
      (gNames.map(n => col(n).as(s"__d_$n")) ++
        Seq(col("__rn").as("__drn"), col("__llr").as("__dllr"))): _*)
    val dKey = gNames.map(n => col(n) <=> col(s"__d_$n")).reduce(_ && _)
    rolled
      .join(atDecision, dKey && col("n_at_decision") === col("__drn"),
        "left")
      .select((gNames.map(col) ++ Seq(col("n_events"), col("n_success"),
        when(col("__dllr") >= boundFp, lit("accept_h1"))
          .when(col("__dllr") <= -boundFp, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"),
        col("n_at_decision"),
        (col("__dllr").cast("double") / (1L << 20))
          .as("llr_at_decision_bits"),
        (col("__last.__llr").cast("double") / (1L << 20))
          .as("llr_final_bits"))): _*)
  }

  /** Per-key one-sided CUSUM changepoint detection in exact integers:
    * `s' = max(0, s + x − target)`; crossing `threshold` raises an alarm
    * and restarts the statistic (the standard restart scheme). All state
    * integer, so alarm counts replay exactly cross-engine — the drift
    * monitor a training-data ingest runs per source. One shuffle on the
    * key, (ts, tiebreak)-ordered fold like [[funnel]]/[[ewmaFixed]].
    *
    * @return (key, n, n_alarms, final_s)
    */
  def cusum(
      events: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
      value: Column,
      target: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val evs = events
      .select(key.as("key"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), value.cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull)
    evs.groupBy(col("key"))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("__t"), col("__tb"), col("__x")))),
          struct(lit(0L).as("alarms"), lit(0L).as("s")),
          (acc, e) => {
            val s1 = greatest(lit(0L),
              acc.getField("s") + e.getField("__x") - target)
            when(s1 > threshold,
              struct((acc.getField("alarms") + 1).as("alarms"), lit(0L).as("s")))
              .otherwise(struct(acc.getField("alarms").as("alarms"), s1.as("s")))
          }).as("__st"),
        count(lit(1)).as("n"))
      .select(col("key"), col("n"),
        col("__st.alarms").as("n_alarms"), col("__st.s").as("final_s"))
  }

  /** Exact TRUNCATING division as a column op (Column has no
    * integral-div method and `/` is a double, lossy past 2⁵³): subtract
    * the `%` remainder (truncating, sign of the dividend — NOT pmod,
    * which floors and would disagree with DuckDB's `//` and Scala's `/`
    * on negative accumulators), divide in DECIMAL (the quotient is an
    * exact integer, so the decimal result is exact), cast back.
    */
  private def expr_div(a: Column, b: Long): Column =
    ((a - (a % lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** Resample per-key events onto a fixed time grid with forward fill:
    * for each key, an hourly (stepped) grid spans [trunc(min ts),
    * trunc(max ts)]; grid cells carry their own aggregate when events
    * exist and the last observed aggregate otherwise (`gap` marks fills).
    * `value` must be an aggregatable column (summed per cell).
    */
  def resampleFfill(
      events: DataFrame,
      key: Column,
      ts: Column,
      value: Column,
      stepUnit: String = "hour"): DataFrame = {
    val cell = events
      .groupBy(key.as("key"), date_trunc(stepUnit, ts).as("bucket"))
      .agg(count(lit(1)).as("n_events"), sum(value).as("v"))
    val grid = cell
      .groupBy(col("key"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"),
          expr(s"interval 1 $stepUnit"))).as("bucket"))
    val fill = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cell, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(fill).as("filled_value"),
        col("n_events").isNull.cast("int").as("gap"))
  }

  /** Theil–Sen robust trend slope per group: the MEDIAN of all pairwise
    * slopes (y2−y1)/(t2−t1) over a (t, y) series — the trend estimator
    * that shrugs off the outliers that wreck an OLS fit (up to 29%
    * contamination), the right default for noisy operational series.
    * Slopes are micro-quantized BEFORE the median — `sign(dy)·(|dy|·10⁶
    * div dx)` (sign-split so truncation-vs-floor never diverges
    * cross-engine) — making the statistic "median of exact micro-slopes":
    * deterministic integers end to end. Even pair counts take the LOWER
    * median (rank ceil(p/2)) — deterministic, no averaging float.
    *
    * Scale posture: the pair fan-out is per-GROUP O(m²) on the series
    * length m (a bounded per-entity series is the intended grain — 3650
    * daily points → 6.7M pairs; do NOT feed one giant unkeyed series);
    * one group-keyed window picks the median rank. Duplicate t within a
    * group must be pre-aggregated by the caller (dx = 0 pairs are
    * excluded, so they'd silently shrink the pair set).
    *
    * @return (g…, n_points, n_pairs, slope) — slope in y-units per
    *   t-unit, 6 dp; null for groups with < 2 distinct t.
    */
  def theilSen(
      df: DataFrame, groupCols: Seq[Column], tCol: Column,
      yCol: Column): DataFrame = {
    val gNames = groupCols.indices.map(i => s"__g$i")
    val base = df.select(
      groupCols.zip(gNames).map { case (c, n) => c.as(n) } ++
        Seq(tCol.cast("long").as("__t"), yCol.cast("long").as("__y")): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    // r14 (§2.4): the pair fan-out is a per-group ARRAY expansion in one
    // codegen projection, not a keyed self-join — the old shape ran the
    // upstream subtree twice (both join inputs), shuffled the O(m²) pair
    // frame through a group-keyed window sort, and joined the median back
    // to the point counts (3 exchanges + 2 joins on the pair path). Here
    // the only exchange is the one point-collect groupBy; the slope
    // multiset, its sort, and the lower-median pick all happen inside the
    // group's row. Same bounded-series contract as before (the per-group
    // O(m²) work was ALREADY single-task — the window sort ran per group);
    // use [[theilSenBlocked]] for long per-entity series.
    val pts = col("__pts")
    // |dy| widens BEFORE the micro multiply: a long |dy|·10⁶ wraps at
    // |dy| ≈ 9.2·10¹² while the decimal stays exact (the oracle's
    // HUGEINT twin); the micro-slope itself must fit a long — contract.
    // dx = 0 pairs (duplicate t, contract-excluded upstream) drop, exactly
    // as the old __t1 < __t2 join condition dropped them.
    def slopeOf(p: Column, q: Column): Column = {
      val dy = q.getField("__y") - p.getField("__y")
      val dx = q.getField("__t") - p.getField("__t")
      when(dx > 0, signum(dy).cast("long") *
        EvalMetrics.idivPos(dec(abs(dy)) * 1000000L, dx))
    }
    base.groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("n_points"),
        sort_array(collect_list(struct(col("__t"), col("__y")))).as("__pts"))
      .withColumn("__slopes", array_sort(flatten(transform(pts,
        (p, i) => filter(
          transform(slice(pts, i + lit(2), size(pts)), q => slopeOf(p, q)),
          s => s.isNotNull)))))
      .withColumn("__np", size(col("__slopes")))
      .select(gNames.zip(groupCols.indices).map { case (n, i) =>
          col(n).as(s"g$i") } ++ Seq(col("n_points"),
        col("__np").cast("long").as("n_pairs"),
        // lower median: the ceil(p/2)-th smallest — rank (np+1) div 2
        when(col("__np") > 0, element_at(col("__slopes"),
            ((col("__np") + 1) / 2).cast("int")).cast("double") / 1e6)
          .as("slope")): _*)
  }

  /** Shared machinery for the blocked pair kernels ([[theilSenBlocked]],
    * [[mannKendallBlocked]]): rank-blocked per-block point arrays, the
    * driver-side group map, and the (gid, blockA, blockB) unit-array
    * frame the kernels consume. EAGER — runs the block checkpoint and
    * the group-map collect (few-groups contract, fail-loud past 2^16
    * groups).
    *
    * `gidMap` columns: (g…, __gid, __n_points, __mb); `unitArrays`
    * columns: (__gid, __ba, __bb, __apts, __bpts, __same).
    */
  private final case class BlockedUnits(
      gidMap: DataFrame, unitArrays: DataFrame, gNames: Seq[String])

  /** Run `body` with AQE disabled on this session, restoring the prior
    * value after. The blocked-kernel internals execute a chain of TINY
    * eager stages (unit counts bounded by (m/B)² per group, selection
    * frames one row per group) where AQE's per-stage job split +
    * re-optimization costs more driver wall than any runtime re-plan
    * could save — q253 measured 13 jobs → 10 and −0.25 s steady on a
    * 32-thread box; the saving grows with driver load since it is pure
    * scheduling/planning wall. Plans RETURNED to the caller execute at
    * the caller's action time under the caller's own conf — only the
    * internal eager actions (block checkpoint, group-map take, unit
    * checkpoint, selection collects) run non-adaptive. The toggle is
    * session-scoped for its duration (the sequential-driver contract
    * these eager operators already carry).
    */
  private def withAqeOff[T](spark: org.apache.spark.sql.SparkSession)(
      body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  private def blockedUnits(
      df: DataFrame, groupCols: Seq[Column], tCol: Column, yCol: Column,
      blockSize: Int, broadcastPointLimit: Long,
      who: String, checkpointUnits: Boolean = true): BlockedUnits = {
    require(blockSize >= 2, s"blockSize must be >= 2: $blockSize")
    val spark = df.sparkSession
    withAqeOff(spark) {
    val gNames = groupCols.indices.map(i => s"__g$i")
    val base = df.select(
      groupCols.zip(gNames).map { case (c, n) => c.as(n) } ++
        Seq(tCol.cast("long").as("__t"), yCol.cast("long").as("__y")): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    // rank-block id + per-block point arrays, checkpointed ONCE: the one
    // per-group sort in the plan is over the m POINTS (never pairs), and
    // the checkpointed frame is bounded by points too (m × 16 B payload
    // in ≤ blockSize arrays). sort_array makes the arrays a canonical
    // function of the block's point multiset; the pair SET is invariant
    // to how row_number breaks t-ties across block boundaries (any
    // block partition enumerates each unordered pair exactly once).
    val wg = Window.partitionBy(gNames.map(col): _*)
    val blockPts = base
      .withColumn("__blk",
        ((row_number().over(wg.orderBy(col("__t"))) - 1) / blockSize)
          .cast("long"))
      .groupBy(gNames.map(col) :+ col("__blk"): _*)
      .agg(sort_array(collect_list(struct(col("__t"), col("__y"))))
        .as("__pts"))
      .localCheckpoint()
    // Group map, collected ONCE (the few-groups contract; fail-loud cap
    // so a mis-aimed many-group call can't melt the driver). A dense
    // LONG group id replaces the caller's group columns through the
    // whole pipeline: every join probe, aggregate row and window key
    // hashes one long instead of the raw (possibly string) keys.
    val maxGroups = 1 << 16
    val gRows = blockPts
      .groupBy(gNames.map(col): _*)
      .agg(sum(size(col("__pts"))).as("__n"), max(col("__blk")).as("__mb"))
      .take(maxGroups + 1)
    require(gRows.length <= maxGroups,
      s"$who is the few-group/long-series form (> $maxGroups " +
        "groups found) — use the flat form for many-group inputs")
    val gFieldCount = gNames.length
    // deterministic gid assignment: field-wise typed comparison of the
    // actual key values (Row.toString is NOT injective — multi-column
    // string groups containing ',' collide, and then tie order would
    // fall back to the nondeterministic take() order). Group keys are
    // distinct by construction, so strict-less is a total order.
    val sortedG = gRows.sortWith { (ra, rb) =>
      var i = 0; var cmp = 0
      while (cmp == 0 && i < gFieldCount) {
        val a = ra.get(i); val b = rb.get(i)
        cmp =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else a.asInstanceOf[Comparable[Any]].compareTo(b)
        i += 1
      }
      cmp < 0
    }
    val mapSchema = org.apache.spark.sql.types.StructType(
      blockPts.schema.fields.take(gFieldCount) ++ Seq(
        org.apache.spark.sql.types.StructField("__gid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__n_points",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__mb",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val mapRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(sortedG.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq.take(gFieldCount) ++
          Seq(i.toLong, r.getLong(gFieldCount), r.getLong(gFieldCount + 1)))
      }: _*)
    val gidMap = spark.createDataFrame(mapRows, mapSchema)
    val totalPoints = gRows.iterator.map(_.getLong(gFieldCount)).sum
    // null-safe: null group values form groups, exactly like the flat
    // forms
    val blockArr = blockPts.join(broadcast(gidMap),
        gNames.map(n => blockPts(n) <=> gidMap(n)).reduce(_ && _))
      .select(col("__gid"), col("__blk"), col("__pts"))
    // work units: every (blockA <= blockB) pair, per group — derived
    // driver-free from the tiny map frame, then joined to the two
    // blocks' point arrays. The explicit repartition on (gid, __ba,
    // __bb) is load-bearing, not style: unit rows carry near-uniform
    // pair counts (≈ blockSize² each), so hashing the unit key spreads
    // the quadratic kernel work evenly — while left alone the tiny unit
    // frame would coalesce to ~1 partition (AQE is blind to the in-
    // kernel m² fan-out, the same trap the row-level form measured at
    // 66.7 s vs 24.8 s flat). When the point frame is small (known
    // exactly driver-side) the block arrays broadcast and the unit
    // build is shuffle-free; past `broadcastPointLimit` it falls back
    // to pinned-exchange sort-merge joins on (gid, block).
    val units = gidMap
      .select(col("__gid"), col("__mb"),
        explode(sequence(lit(0L), col("__mb"))).as("__ba"))
      .select(col("__gid"), col("__ba"),
        explode(sequence(col("__ba"), col("__mb"))).as("__bb"))
    val nP = spark.sessionState.conf.numShufflePartitions
    val joined =
      if (totalPoints <= broadcastPointLimit) {
        // Collect the block arrays ONCE (bounded by broadcastPointLimit
        // — the same bytes the broadcast would pin on the driver anyway)
        // and re-ship them as LOCAL relations: broadcasting a
        // LocalTableScan schedules no job, so the blockArr execution
        // plus the two block-side broadcast builds collapse from three
        // scheduled jobs into one collect. The wall of this operator is
        // job-count/planning-bound, not compute-bound (q253 profile:
        // ~0.55 s kernel across 19 jobs ~1.9 s), so every job removed
        // is wall removed on a loaded driver.
        val local = spark.createDataFrame(
          java.util.Arrays.asList(blockArr.collect(): _*), blockArr.schema)
        units.join(broadcast(local.toDF("__gid", "__ba", "__apts")),
            Seq("__gid", "__ba"))
          .join(broadcast(local.toDF("__gid", "__bb", "__bpts")),
            Seq("__gid", "__bb"))
      } else {
        val aBlk = blockArr.toDF("__gid", "__ba", "__apts")
        val bBlk = blockArr.toDF("__gid", "__bb", "__bpts")
        units.repartition(nP, col("__gid"), col("__ba"))
          .join(aBlk.repartition(nP, col("__gid"), col("__ba"))
            .hint("merge"), Seq("__gid", "__ba"))
          .repartition(nP, col("__gid"), col("__bb"))
          .join(bBlk.repartition(nP, col("__gid"), col("__bb"))
            .hint("merge"), Seq("__gid", "__bb"))
      }
    val unitArrays0 = joined
      .withColumn("__same", col("__ba") === col("__bb"))
      .repartition(nP, col("__gid"), col("__ba"), col("__bb"))
    // reuse across passes only when the exact driver-computed size is
    // small; past the cap each consumer rebuilds from the cheap
    // block-array joins instead of materializing O((m/B)²) array copies
    val estUnitBytes = gRows.iterator.map { r =>
      val mb = r.getLong(gFieldCount + 1)
      (mb + 1) * (mb + 2) / 2 * 2 * blockSize.toLong * 16
    }.sum
    val unitArrays =
      if (checkpointUnits && estUnitBytes <= (256L << 20))
        unitArrays0.localCheckpoint()
      else unitArrays0
    BlockedUnits(gidMap, unitArrays, gNames)
    }
  }

  /** Test seam: the unit frame WITHOUT its checkpoint — the checkpoint
    * truncates executedPlan to a scan, hiding the load-bearing pinned
    * repartition on (gid, __ba, __bb) from plan assertions
    * (MiningOpsSpec pins that the kernel work actually spreads).
    */
  private[graft] def unitFrameForPlanCheck(
      df: DataFrame, groupCols: Seq[Column], tCol: Column, yCol: Column,
      blockSize: Int): DataFrame =
    blockedUnits(df, groupCols, tCol, yCol, blockSize,
      broadcastPointLimit = 1L << 21, who = "unitFrameForPlanCheck",
      checkpointUnits = false).unitArrays

  /** [[theilSen]] for the FEW-GROUP / LONG-SERIES shape — identical
    * estimator (same micro-quantized slopes, same lower median), but the
    * per-group O(m²) pair work is BLOCK-DECOMPOSED so one entity's
    * quadratic work spreads across the cluster instead of landing on a
    * single task: points get a rank-block id (`blockSize` per block),
    * every (blockA ≤ blockB) pair becomes one work unit carrying the two
    * blocks' point ARRAYS, and [[graft.functions.TheilPairScan]] consumes
    * each unit's pair set inside one compiled primitive-long loop — the
    * m² pairs are never materialized as rows (the row-level formulation,
    * join fan-out → slope projection → aggregate, pays ~3 UnsafeRow
    * materializations per pair; at q253's 14.5M pairs that was ~95% of
    * both selection passes' wall, measured — the slope arithmetic itself
    * is ~2%). The median is adaptive bucket selection (coarse slope-
    * bucket histogram at shift 30 → optional one-level refinement at
    * shift 14 → in-bucket k-th pick): no task ever sorts or holds the
    * raw pair set, and every exchange carries only non-empty bucket
    * counts or the one selected bucket's slopes (≤ `refineThreshold`
    * rows on the cold path, one 2^14-wide bucket's mass on the refined
    * path; mass-tied slopes still degrade to one sorted task — exact,
    * documented).
    *
    * Use [[theilSen]] when groups are many and series short (its flat
    * per-group join is cheaper); use this form when group-count ×
    * series-length says a group's pair set dwarfs a task — the shape
    * the q243 weekly re-base dodged (5 groups × 2,400 daily points =
    * 24.8 s single-task) and q253 runs head-on.
    *
    * EAGER, unlike every other operator in this module: calling it runs
    * Spark jobs immediately (the block-array localCheckpoint, the group
    * map, and the hot-bucket probe that picks the refinement branch) —
    * load-bearing for the adaptive selection, which must read data
    * statistics before it can shape the remaining plan. Don't compose it
    * inside a plan you expect to stay lazy; treat the call itself as an
    * action.
    *
    * SINGLE-THREADED SESSION REQUIRED for the duration of the call: the
    * internal eager stages run with `spark.sql.adaptive.enabled` set to
    * false session-wide (restored in a finally) because AQE's per-stage
    * re-planning costs more driver wall than it can save on these tiny
    * bounded frames. A query submitted CONCURRENTLY on the same
    * SparkSession while this call is in flight would silently execute
    * non-adaptive, and two overlapping blocked calls race the restore
    * (last writer wins). Run blocked operators from one driver thread
    * per session, or give concurrent workloads their own
    * `spark.newSession()`.
    *
    * @return (g…, n_points, n_pairs, slope) — bit-identical to
    *   [[theilSen]] on the same input.
    */
  def theilSenBlocked(
      df: DataFrame, groupCols: Seq[Column], tCol: Column,
      yCol: Column, blockSize: Int = 128,
      refineThreshold: Long = 1L << 18,
      broadcastPointLimit: Long = 1L << 21): DataFrame = {
    require(refineThreshold >= 1, s"refineThreshold must be >= 1")
    val bu = blockedUnits(df, groupCols, tCol, yCol, blockSize,
      broadcastPointLimit, "theilSenBlocked")
    val gidMap = bu.gidMap; val unitArrays = bu.unitArrays
    val gNames = bu.gNames
    import graft.functions.TheilPairScan
    // pass 1: slope-bucket histogram at shift 30 — the kernel histograms
    // each unit locally, the exchange carries only non-empty (gid,
    // bucket) counts, map-side combined. Arithmetic shiftright floors
    // negatives, so buckets order correctly across zero.
    val hist = unitArrays
      .select(col("__gid"), explode(TheilPairScan.expr(col("__apts"),
        col("__bpts"), col("__same"), lit(0L), -1, 30)).as("__h"))
      .select(col("__gid"), col("__h.b").as("__b"), col("__h.c").as("__hc"))
      .groupBy(col("__gid"), col("__b")).agg(sum(col("__hc")).as("__c"))
    val w = Window.partitionBy(col("__gid"))
    // generic one-level picker: per group, the bucket of `bCol` holding
    // rank `kCol` on the bucket-ascending walk, and the offset inside it
    def pickBucket(cnts: DataFrame, bCol: String, kExpr: Column => Column)
        : DataFrame = {
      val cum = cnts
        .withColumn("__cum", sum(col("__c")).over(
          w.orderBy(col(bCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__tot", sum(col("__c")).over(w))
      val k = kExpr(col("__tot"))
      cum.filter(col("__cum") >= k && col("__cum") - col("__c") < k)
        .select(col("__gid"), col(bCol),
          (k - (col("__cum") - col("__c"))).as("__k"),
          col("__tot"), col("__c").as("__hot"))
    }
    // pass-1 selection — ONE row per group (the few-groups contract),
    // so collect it outright and re-ship as a local relation: the
    // downstream broadcasts schedule no job, and the hot-bucket probe
    // reads the rows already in hand instead of running its own job
    // (was a localCheckpoint + head(), two scheduled jobs + planning).
    val med = withAqeOff(df.sparkSession) {
    val sel0 = pickBucket(hist, "__b", _ => expr("(__tot + 1) div 2"))
    val selRows = sel0.collect()
    val sel = sel0.sparkSession.createDataFrame(
      java.util.Arrays.asList(selRows: _*), sel0.schema)
    val hot = selRows.iterator.map(_.getAs[Long]("__hot"))
      .foldLeft(0L)(math.max)
    def withSel(s: DataFrame, bCol: String): DataFrame =
      unitArrays.join(broadcast(s.select(col("__gid"),
        col(bCol).as("__sb"), col("__k"), col("__tot"))), Seq("__gid"))
    def kth(selected: DataFrame, filterShift: Int): DataFrame = selected
      .select(col("__gid"), col("__k"), col("__tot"),
        explode(TheilPairScan.expr(col("__apts"), col("__bpts"),
          col("__same"), col("__sb"), filterShift, -1)).as("__s"))
      .withColumn("__rn", row_number().over(w.orderBy(col("__s"))))
      .filter(col("__rn") === col("__k"))
    (if (hot <= refineThreshold) {
      // cold bucket: select the __k-th smallest slope inside it
      kth(withSel(sel, "__b"), 30)
    } else {
      // hot bucket: refine within it at shift 14, then select
      val hist14 = withSel(sel, "__b")
        .select(col("__gid"), col("__k"),
          explode(TheilPairScan.expr(col("__apts"), col("__bpts"),
            col("__same"), col("__sb"), 30, 14)).as("__h"))
        .select(col("__gid"), col("__k"), col("__h.b").as("__b2"),
          col("__h.c").as("__hc"))
        .groupBy(col("__gid"), col("__b2"))
        .agg(sum(col("__hc")).as("__c"), first(col("__k")).as("__k1"))
      // pickBucket's own __tot here is the CANDIDATE count (bucket-1
      // mass), not the pair total — drop it and re-join the true total
      // from the level-1 selection
      val sel2a = pickBucket(hist14, "__b2", _ => col("__k1"))
        .drop("__tot")
        .join(sel.select(col("__gid"), col("__tot")), Seq("__gid"))
      // same local-relation treatment as sel: one row per group
      val sel2 = sel2a.sparkSession.createDataFrame(
        java.util.Arrays.asList(sel2a.collect(): _*), sel2a.schema)
      kth(withSel(sel2, "__b2"), 14)
    }).select(col("__gid"), col("__tot").as("n_pairs"),
      (col("__s").cast("double") / 1e6).as("slope"))
    }
    // n_points comes straight off the driver-side group map — no extra
    // aggregation job over the point frame
    gidMap.join(med, Seq("__gid"), "left")
      .select(gNames.zip(groupCols.indices).map { case (n, i) =>
          col(n).as(s"g$i") } ++ Seq(col("__n_points").as("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope")): _*)
  }

  /** Mann–Kendall trend test per group — [[theilSenBlocked]]'s paired
    * significance gate (MK answers "IS there a monotone trend?", the
    * Theil–Sen slope answers "how steep?" — the two ship together in
    * every operational trend kit): S = Σ sign((y₂−y₁)(t₂−t₁)) over all
    * t-distinct pairs, folded per (group, block-pair) unit by the
    * compiled [[graft.functions.MannKendallScan]] kernel — the same
    * blocked decomposition, group map and unit frame as the slope, ONE
    * pass (no selection), pairs never materialized.
    *
    * Everything downstream of S is exact integers: the tie-corrected
    * variance 18·Var(S) = n(n−1)(2n+5) − Σ_y t(t−1)(2t+5) (y-value tie
    * groups from one (gid, y) count aggregation over the within-block
    * arrays), the continuity-corrected z² = 18·(|S|−1)² / (18·Var) as a
    * micro-rounded rational, and `significant` vs the chi-square(1) 95%
    * value 3.841459 in cross-multiplied integers. tau is the untied
    * Kendall coefficient 2S/(n(n−1)), micro-rounded. Null
    * z²/significant when n < 2 or the variance is 0 (all values tied).
    * Duplicate t within a group must be pre-aggregated by the caller
    * (the theilSen contract): dx = 0 pairs are excluded from S, but
    * Var(S) assumes distinct times.
    *
    * EAGER like [[theilSenBlocked]] (block checkpoint + group map),
    * and carries the same SINGLE-THREADED SESSION requirement: the
    * internal eager stages toggle `spark.sql.adaptive.enabled` off
    * session-wide for their duration — see [[theilSenBlocked]]'s
    * contract paragraph.
    * Envelope: the BINDING term is the displayed `var18` long —
    * ~2n³ > 2⁶³ at n ≈ 1.66·10⁶ points per group (the decimal
    * internals hold much further: n(n−1)(2n+5) to ~10¹², (|S|−1)² to
    * ~10¹⁸ pairs). All overflows are loud (ANSI cast / HUGEINT), never
    * silent — but size per-group series under ~1.6M points or drop the
    * var18 display column before going bigger.
    *
    * @return (g…, n_points, n_pairs, s, var18, tau, z2, significant)
    */
  def mannKendallBlocked(
      df: DataFrame, groupCols: Seq[Column], tCol: Column,
      yCol: Column, blockSize: Int = 128,
      broadcastPointLimit: Long = 1L << 21): DataFrame = {
    val bu = blockedUnits(df, groupCols, tCol, yCol, blockSize,
      broadcastPointLimit, "mannKendallBlocked")
    val gNames = bu.gNames
    // one kernel pass: per-unit (S, pair count) folded to per-group sums
    val mk = bu.unitArrays
      .select(col("__gid"), graft.functions.MannKendallScan.expr(
        col("__apts"), col("__bpts"), col("__same")).as("__m"))
      .groupBy(col("__gid"))
      .agg(sum(col("__m.s")).as("s"), sum(col("__m.np")).as("n_pairs"))
    // y-value tie groups: one (gid, y) count agg over the point multiset
    // (each point appears in exactly ONE same-block unit's a-array —
    // map-side combined, the exchange is distinct values per group)
    val ties = bu.unitArrays
      .filter(col("__same"))
      .select(col("__gid"), explode(col("__apts")).as("__p"))
      .groupBy(col("__gid"), col("__p.__y").as("__yv"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__gid"))
      .agg(sum(dec(col("__t")) * (col("__t") - 1) * (col("__t") * 2 + 5))
        .as("__tcorr"))
    val joined = bu.gidMap
      .join(mk, Seq("__gid"), "left")
      .join(ties, Seq("__gid"), "left")
    val n = col("__n_points")
    val var18 = dec(n) * (n - 1) * (n * 2 + 5) -
      coalesce(col("__tcorr"), lit(0L).cast("decimal(38,0)"))
    val absS = abs(coalesce(col("s"), lit(0L)))
    // continuity correction: z = (|S|−1)/sqrt(Var) for S ≠ 0, 0 for S = 0
    val z2num = when(absS > 0, (dec(absS) - 1) * (dec(absS) - 1) * 18L)
      .otherwise(lit(0L).cast("decimal(38,0)"))
    val defined = n >= 2 && var18 > 0
    joined.select(gNames.zip(groupCols.indices).map { case (nm, i) =>
        col(nm).as(s"g$i") } ++ Seq(
      n.as("n_points"),
      coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
      coalesce(col("s"), lit(0L)).as("s"),
      when(n >= 2, var18.cast("long")).as("var18"),
      when(n >= 2, EvalMetrics.microRound6(coalesce(col("s"), lit(0L)) * 2,
        dec(n) * (n - 1)).cast("double") / 1e6).as("tau"),
      when(defined, EvalMetrics.microRound6(z2num, var18)
        .cast("double") / 1e6).as("z2"),
      when(defined,
        when(z2num * 1000000L > var18 * 3841459L, 1).otherwise(0))
        .as("significant")): _*)
  }



  /** Single changepoint detection per series (binary segmentation, one
    * split): the boundary k that maximizes the between-segment SSE
    * reduction — the "when did the metric change regime?" primitive
    * behind alerting and A/B cutover audits, complementing [[cusum]]
    * (which needs a reference mean; this derives its own). All exact
    * integers via prefix sums: with S_k the prefix sum at position k and
    * A_k = n·S_k − k·S_n, the split gain is ⌊A_k²/(k(n−k))⌋ (monotone in
    * the true SSE reduction; integer-quantized, so gains within one
    * y²-unit tie and fall to the earliest boundary) and the segment-mean
    * gap is EXACTLY A_k/(k(n−k)), micro-rounded for display. A_k² is
    * decimal(38,0)-exact to |A| ≈ 10¹⁹ — n·Σ|y| ≲ 10¹⁹ (a 3650-point
    * daily series in cents sits at 10¹⁶); past that both engines fail
    * loud (ANSI decimal / HUGEINT overflow), never silently.
    *
    * Scale posture: one group-keyed ordered window builds k and S_k in
    * a single pass (running frame + whole-partition totals — never
    * unpartitioned); the argmax is a struct-max aggregation, no second
    * sort. Series are the per-GROUP grain: bounded length by contract.
    *
    * @return (g…, n_points, split_t — the LAST t of the left segment,
    *   left_n, mean_diff = right mean − left mean in y-units, 6 dp);
    *   groups with < 2 points have no candidate split and are absent.
    */
  def changepoint(
      df: DataFrame, groupCols: Seq[Column], tCol: Column,
      yCol: Column): DataFrame = {
    val gNames = groupCols.indices.map(i => s"__g$i")
    val base = df.select(
      groupCols.zip(gNames).map { case (c, n) => c.as(n) } ++
        Seq(tCol.cast("long").as("__t"), yCol.cast("long").as("__y")): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    val w = Window.partitionBy(gNames.map(col): _*)
    val ordered = w.orderBy(col("__t"))
    val ranked = base
      .withColumn("__k", row_number().over(ordered))
      .withColumn("__sk", sum(col("__y")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sn", sum(col("__y")).over(w))
    val a = dec(col("__n")) * col("__sk") - dec(col("__k")) * col("__sn")
    val den = dec(col("__k")) * (col("__n") - col("__k"))
    val cand = ranked.filter(col("__k") < col("__n"))
      .select(gNames.map(col) ++ Seq(col("__n"), col("__t"), col("__k"),
        (a * a).as("__a2"), den.as("__den"),
        // mean gap = A/(k(n−k)) with A's sign inverted: A_k = n·S_k −
        // k·S_n = k(n−k)·(left − right) ⇒ negate for right − left
        (-EvalMetrics.microRound6(a, den)).as("__gap")): _*)
      .select(gNames.map(col) ++ Seq(col("__n"),
        struct(
          // integer-quantized gain by exact floor division — replayable
          // as `//`; quantization ties fall to the earliest k. Envelope:
          // the quotient rides Spark decimal '/', whose result type is
          // decimal(38,6) — a gain above ~1e32 overflows THERE, a
          // tighter ceiling than the decimal(38,0) numerator's 1e38
          // (gain = A²/den with |A| ≤ n·|S|; loud under ANSI, and ~1e32
          // needs n·Σ|y| beyond 1e19 — far past the long-cast inputs)
          ((col("__a2") - pmod(col("__a2"), col("__den"))) / col("__den"))
            .cast("decimal(38,0)").as("gain"),
          (-col("__k")).as("negk"), col("__t").as("t"),
          col("__k").as("k"), col("__gap").as("gap")).as("__c")): _*)
    cand.groupBy(gNames.map(col): _*)
      .agg(max(col("__n")).as("n_points"), max(col("__c")).as("__best"))
      .select(gNames.zip(groupCols.indices).map { case (n, i) =>
          col(n).as(s"g$i") } ++ Seq(col("n_points"),
        col("__best.t").as("split_t"), col("__best.k").as("left_n"),
        (col("__best.gap").cast("double") / 1e6).as("mean_diff")): _*)
  }

  /** Index of dispersion (variance-to-mean ratio, the Fano factor) of
    * per-bucket event counts, per group — the burstiness audit: a
    * Poisson-uniform stream reads ≈ 1, batchy/bursty traffic ≫ 1,
    * metronome-regular < 1. EMPTY buckets inside the observed span count
    * as zeros WITHOUT being materialized: with m = span/step + 1 total
    * buckets and counts c_i over the non-empty ones,
    * `D = (m·Σc² − (Σc)²) / (m·Σc)` — exact integers, micro-rounded.
    *
    * Scale posture: one (group, bucket) aggregation (map-side combined),
    * then a group rollup — two exchanges, both collapsing; no windows,
    * no bucket materialization.
    *
    * @param step bucket width in the unit of `tCol` after integer
    *   division (e.g. tCol = epoch seconds, step = 3600 → hourly).
    * @return (g…, n_events, n_buckets, dispersion) — null when the span
    *   is a single bucket.
    */
  def dispersionIndex(
      df: DataFrame, groupCols: Seq[Column], tCol: Column,
      step: Long): DataFrame = {
    require(step >= 1, s"bad step: $step")
    val gNames = groupCols.indices.map(i => s"__g$i")
    val bucket = EvalMetrics.idivPos(tCol.cast("long"), lit(step))
    val counts = df
      .select(groupCols.zip(gNames).map { case (c, n) => c.as(n) } :+
        bucket.as("__b"): _*)
      .filter(col("__b").isNotNull)
      .groupBy(gNames.map(col) :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(gNames.map(col): _*)
      .agg(sum(col("__c")).as("__sc"),
        sum(dec(col("__c")) * col("__c")).as("__sc2"),
        (max(col("__b")) - min(col("__b")) + 1).as("__m"))
      .select(gNames.zip(groupCols.indices).map { case (n, i) =>
          col(n).as(s"g$i") } ++ Seq(
        col("__sc").as("n_events"), col("__m").as("n_buckets"),
        when(col("__m") > 1,
          EvalMetrics.microRound6(
            dec(col("__m")) * col("__sc2") - dec(col("__sc")) * col("__sc"),
            dec(col("__m")) * col("__sc")).cast("double") / 1e6)
          .as("dispersion")): _*)
  }

  /** RFM segmentation (Recency / Frequency / Monetary) over an order-grain
    * table — the classical customer-value grid a warehouse ships to
    * marketing: each customer scored 1–5 per dimension by VALUE quantile,
    * segment code `r·100 + f·10 + m` (555 = recent + frequent + big).
    *
    * Scores are value-quantile bins, NOT positional NTILE: customers with
    * an equal metric value always share a score (`(rank−1)·5 div n + 1` on
    * the oracle surface) — positional NTILE splits ties by an arbitrary
    * tiebreak, which is both nondeterministic across engines and unfair
    * to the tied customers. Higher is better on every axis: recency is
    * days-since-epoch of the LAST order (larger = more recent).
    *
    * Scale posture: one customer-grain aggregation (the only row-level
    * exchange), then three [[TableOps.valueQuantileBins]] score mappings
    * — each a distinct-value-bounded two-stage prefix sum (the
    * guard-banned global NTILE window never appears) — joined back on
    * the metric value. The recency/frequency mappings are
    * date-/count-bounded; the monetary mapping is distinct-amount-
    * bounded (hash equi-join, AQE picks the strategy).
    *
    * Orders with a null date or amount are dropped BEFORE aggregation
    * (frequency counts clean orders only); a customer appears iff they
    * have at least one clean order — the oracle applies the same WHERE,
    * so null handling is on the correctness surface, not convention.
    *
    * @param amount integer money (cents) — the caller fixes the unit.
    * @return (customer, recency_days, frequency, monetary, r_score,
    *   f_score, m_score, segment)
    */
  /** U-shaped (position-based) multi-touch attribution — the standard
    * 40/20/40 credit model next to [[graft.plans]] q199's last-touch:
    * for every user who CONVERTS, the touches strictly before their
    * FIRST conversion share one credit unit — 40% to the first touch,
    * 40% to the last, 20% split evenly across the middles. All credit
    * is EXACT micro-integers summing to 1,000,000 per converted user
    * by construction: m = 1 → 1,000,000; m = 2 → 500,000 each; m ≥ 3 →
    * first/last 400,000 and each middle 200000 div (m−2), with the
    * division remainder assigned to the EARLIEST middle (deterministic,
    * the Hamilton-remainder convention of [[Mixture]]).
    *
    * "Strictly before" is lexicographic on (ts, tiebreak) — a touch
    * sharing the conversion's timestamp attributes only if its tiebreak
    * sorts earlier. Users without a conversion contribute nothing.
    *
    * Null contract: rows where `isConversion` evaluates NULL are
    * DROPPED — a null is neither a conversion (the `min(when(...))`
    * skips it) nor a touch (`!null` filters it out), mirroring
    * [[logRank]]'s null-arm convention. An oracle that CASEs nulls
    * into touches would diverge; bucket nulls explicitly upstream
    * (`coalesce(isConversion, lit(false))`) if "null means touch" is
    * the intended reading.
    *
    * Scale posture: ONE user-keyed exchange (the ordered window that
    * finds the first conversion, positions the touches and counts m),
    * then one channel aggregation over per-touch credit rows — no
    * joins, no per-step shuffles.
    *
    * @return (channel, credit_micro, n_touches, n_first, n_last)
    */
  def attributionUShaped(events: DataFrame, user: Column, ts: Column,
      tiebreak: Column, channel: Column, isConversion: Column): DataFrame = {
    val base = events
      .filter(ts.isNotNull)
      .select(user.as("__u"), unix_micros(ts).as("__t"),
        tiebreak.as("__tb"), channel.as("__ch"),
        isConversion.cast("boolean").as("__cv"))
    val wu = Window.partitionBy(col("__u"))
    val wOrd = wu.orderBy(col("__t"), col("__tb"))
    val conv = min(when(col("__cv"), struct(col("__t"), col("__tb"))))
      .over(wu)
    val touches = base
      .withColumn("__conv", conv)
      .filter(col("__conv").isNotNull && !col("__cv") &&
        struct(col("__t"), col("__tb")) < col("__conv"))
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__m", count(lit(1)).over(wu))
    val m = col("__m")
    val mid = m - 2
    val credit = when(m === 1, 1000000L)
      .when(m === 2, 500000L)
      .when(col("__i") === 1 || col("__i") === m, 400000L)
      .when(col("__i") === 2, // earliest middle carries the remainder
        expr("200000 div (__m - 2)") + lit(200000L) % mid)
      .otherwise(expr("200000 div (__m - 2)"))
    touches
      .groupBy(col("__ch").as("channel"))
      .agg(sum(credit).as("credit_micro"),
        count(lit(1)).as("n_touches"),
        sum(when(col("__i") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("__i") === col("__m"), 1L).otherwise(0L))
          .as("n_last"))
  }

  /** Kaplan–Meier survival estimator per group — the retention/churn
    * curve over right-censored lifetimes (Kaplan & Meier 1958): one row
    * per subject with an observed `duration` and an `event` flag
    * (1 = the terminal event happened, 0 = censored at that duration).
    * At each distinct duration t with d_t events out of n_t at risk
    * (everyone whose duration ≥ t, censored included — the standard
    * at-risk definition), S(t) = Π_{u ≤ t} (n_u − d_u)/n_u.
    *
    * The product is carried EXACTLY in the log domain: each factor
    * contributes lg2fp(n−d) − lg2fp(n) in 2²⁰ fixed point
    * ([[graft.functions.Log2Fixed]] — the q278/q280 convention, LUT
    * replayed verbatim by the oracle), so `survival_bits` (= log2 S)
    * replays bit-for-bit cross-engine; no floating product, no
    * engine-dependent rounding. A step where every at-risk subject
    * events (n == d) drives S to exactly 0 — from that t on the row
    * reports `extinct` = 1 and null bits (log of zero), the fail-loud
    * convention rather than a fake −∞. Censor-only times (d = 0) emit
    * a row with the running bits unchanged — the censor ticks of a
    * standard KM table.
    *
    * Scale posture: ONE exchange — the (group, duration) cell
    * aggregation (map-side combined); at-risk counts, the extinction
    * flag and the cumulative bits all ride ONE group-keyed ordered
    * window pass over the duration-bounded cell frame (suffix frame
    * for n_t, prefix frames for the rest — same partition+order, one
    * sort). Output is O(distinct durations) per group.
    *
    * @return (g…, t, n_risk, d_events, c_censored, extinct,
    *         survival_bits)
    */
  def kaplanMeier(df: DataFrame, groupCols: Seq[Column],
      durationCol: Column, eventCol: Column): DataFrame = {
    import graft.functions.Log2Fixed
    val gNames = groupCols.indices.map(i => s"__g$i")
    val base = df.select(
      groupCols.zip(gNames).map { case (c, n) => c.as(n) } ++ Seq(
        durationCol.cast("long").as("__t"),
        eventCol.cast("long").as("__e")): _*)
      .filter(col("__t").isNotNull && col("__e").isNotNull)
    val cell = base
      .groupBy(gNames.map(col) :+ col("__t"): _*)
      .agg(sum(col("__e")).as("__d"), sum(lit(1L) - col("__e")).as("__c"))
    val wOrd = Window.partitionBy(gNames.map(col): _*).orderBy(col("__t"))
    val wSuffix = wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrefix = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the GREATEST guard keeps the log total even on the extinct row the
    // when() discards (the oracle's staged stages compute unconditionally)
    val step = when(col("__d") > 0 && col("__n") > col("__d"),
      Log2Fixed.expr(greatest(col("__n") - col("__d"), lit(1L))) -
        Log2Fixed.expr(col("__n"))).otherwise(lit(0L))
    cell
      .withColumn("__n", sum(col("__d") + col("__c")).over(wSuffix))
      .withColumn("__bits", sum(step).over(wPrefix))
      .withColumn("__ext", max(
        when(col("__d") > 0 && col("__d") === col("__n"), 1).otherwise(0))
        .over(wPrefix))
      .select(gNames.zip(groupCols.indices).map { case (n, i) =>
          col(n).as(s"g$i") } ++ Seq(
        col("__t").as("t"), col("__n").as("n_risk"),
        col("__d").as("d_events"), col("__c").as("c_censored"),
        col("__ext").as("extinct"),
        when(col("__ext") === 0,
          col("__bits").cast("double") / Log2Fixed.One)
          .as("survival_bits")): _*)
  }

  /** Log-rank test per group — [[kaplanMeier]]'s paired significance
    * gate (the curve answers "what does retention look like?", this
    * answers "are the two cohorts' curves DIFFERENT?" — the two ship
    * together in every survival kit, the q253/q262 pairing again). Two
    * arms (A = `armCol` true); at each event time t with d events out
    * of n at risk (n_a in arm A):
    *
    *   O_A = d_a,   E_A = n_a·d/n,   V = d(n−d)·n_a·n_b / (n²(n−1))
    *   χ² = (Σ(O_A − E_A))² / ΣV   vs chi-square(1) 95%
    *
    * Exact quantization chain (the house convention — each E and V term
    * micro-rounded ONCE, sums in plain longs, every floor replicated by
    * the oracle): e_a = microRound6(n_a·d, n), v = microRound6(
    * d(n−d)n_a·n_b, n²(n−1)) for n > 1, u = Σ(10⁶·d_a − e_a),
    * chi2_micro = microRound6(u², 10⁶·v); `significant` compares
    * u² > v·Z2 in cross-multiplied DECIMAL integers (unrounded).
    *
    * Scale posture: ONE (group, duration) cell aggregation, then the
    * same single ordered window pass as [[kaplanMeier]] (suffix frames
    * for both arms' at-risk counts) and a group-bounded rollup.
    * Envelope: the V-term numerator ~n⁴/16 meets microRound6's ×2·10⁶
    * internal at ~5·10⁷ subjects per group — loud past (ANSI), the
    * wilcoxon subsample-beyond convention. A group with NO event times
    * (everyone censored) emits no row at all — there is nothing to
    * test; callers wanting a placeholder row outer-join the group
    * frame. Subjects whose `armCol` evaluates null are EXCLUDED (the
    * mcnemar/cochranQ null-row convention) — an oracle that CASEs a
    * null comparison into arm B would diverge; bucket nulls explicitly
    * upstream if they belong to an arm.
    *
    * @return (g…, n_times, o_a, e_a, o_b, e_b, chi2, significant)
    */
  def logRank(df: DataFrame, groupCols: Seq[Column], armCol: Column,
      durationCol: Column, eventCol: Column): DataFrame = {
    import graft.operators.EvalMetrics.microRound6
    def dec(c: Column) = c.cast("decimal(38,0)")
    val gNames = groupCols.indices.map(i => s"__g$i")
    val base = df.select(
      groupCols.zip(gNames).map { case (c, n) => c.as(n) } ++ Seq(
        durationCol.cast("long").as("__t"),
        eventCol.cast("long").as("__e"),
        armCol.cast("boolean").cast("long").as("__a")): _*)
      .filter(col("__t").isNotNull && col("__e").isNotNull &&
        col("__a").isNotNull)
    val cell = base
      .groupBy(gNames.map(col) :+ col("__t"): _*)
      .agg(sum(col("__e") * col("__a")).as("__da"),
        sum(col("__e") * (lit(1L) - col("__a"))).as("__db"),
        sum(col("__a")).as("__ca"),
        sum(lit(1L) - col("__a")).as("__cb"))
    val wSuffix = Window.partitionBy(gNames.map(col): _*)
      .orderBy(col("__t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val stepped = cell
      .withColumn("__na", sum(col("__ca")).over(wSuffix))
      .withColumn("__nb", sum(col("__cb")).over(wSuffix))
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__n", col("__na") + col("__nb"))
      .filter(col("__d") > 0)
      .withColumn("__ea", microRound6(dec(col("__na")) * col("__d"),
        col("__n")))
      .withColumn("__eb", microRound6(dec(col("__nb")) * col("__d"),
        col("__n")))
      .withColumn("__v", when(col("__n") > 1, microRound6(
        dec(col("__d")) * (col("__n") - col("__d")) * dec(col("__na")) *
          dec(col("__nb")),
        dec(col("__n")) * dec(col("__n")) * (col("__n") - 1)))
        .otherwise(0L))
    val u = col("__u")
    stepped.groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("n_times"),
        sum(col("__da")).as("o_a"), sum(col("__db")).as("o_b"),
        sum(col("__ea")).as("__sea"), sum(col("__eb")).as("__seb"),
        sum(col("__da") * 1000000L - col("__ea")).as("__u"),
        sum(col("__v")).as("__sv"))
      .select(gNames.zip(groupCols.indices).map { case (n, i) =>
          col(n).as(s"g$i") } ++ Seq(
        col("n_times"), col("o_a"),
        (col("__sea").cast("double") / 1e6).as("e_a"),
        col("o_b"), (col("__seb").cast("double") / 1e6).as("e_b"),
        when(col("__sv") > 0,
          microRound6(dec(u) * dec(u), dec(col("__sv")) * 1000000L)
            .cast("double") / 1e6).as("chi2"),
        when(col("__sv") > 0,
          when(dec(u) * dec(u) > dec(col("__sv")) * 3841459L, 1)
            .otherwise(0)).as("significant")): _*)
  }

  def rfmScores(
      df: DataFrame, custCol: Column, dateCol: Column,
      amount: Column): DataFrame = {
    val cust = df
      .filter(custCol.isNotNull && dateCol.isNotNull && amount.isNotNull)
      .groupBy(custCol.as("customer"))
      .agg(
        datediff(max(dateCol), lit("1970-01-01").cast("date")).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(amount.cast("long")).as("monetary"))
      .localCheckpoint() // consumed by the 3 mappings + the final join
    def mapping(metric: String, score: String, shift: Int) =
      TableOps.valueQuantileBins(cust, col(metric), 5, coarseShift = shift)
        .select(col("__v").as(metric),
          (col("bin") + 1).cast("long").as(score))
    cust
      .join(mapping("recency_days", "r_score", 8), Seq("recency_days"))
      .join(mapping("frequency", "f_score", 8), Seq("frequency"))
      .join(mapping("monetary", "m_score", 20), Seq("monetary"))
      .select(col("customer"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("segment"))
  }
}
