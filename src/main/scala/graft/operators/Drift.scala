package graft.operators

import graft.functions.Log2Fixed
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift and digit-law audits — the monitoring statistics a
  * production pipeline computes between snapshots (did the score/category
  * mix move?) and over raw numeric columns (does a money column still
  * look organic?). Everything is exact-integer / fixed-point so the whole
  * surface replays in the DuckDB oracle: PSI terms are rationals times a
  * [[Log2Fixed]] log, Benford distance is one integer numerator.
  */
object Drift {

  import EvalMetrics.{dec, microRound6}

  /** Population stability index (in BITS — log2 in place of ln, the
    * monotone-equivalent fixed-point form) between a reference and a
    * current population, per group: for each observed bin
    * p = (n_ref+L)/(N_ref+L*B), q = (n_cur+L)/(N_cur+L*B) (Laplace-
    * smoothed over the B bins observed in EITHER side, so empty-on-one-
    * side bins contribute finitely), and PSI = sum (p-q)*log2(p/q).
    * Terms are mathematically non-negative, but the fixed-point log2
    * carries ~3e-6 interpolation error, so a bin where p and q are huge
    * and nearly equal can round to a slightly NEGATIVE term — rounding is
    * sign-aware on both engines, so parity holds; do not assert
    * term_bits >= 0 downstream. Output: one row per (group, bin) with
    * the smoothed counts and the bin's term, plus the group-level
    * `psi_bits` repeated from a group-bounded join.
    *
    * `binCol` need not be named "bin" — it is aliased internally;
    * `groupCols` must be plain column references (re-resolved across
    * aggregations). `isCurrent`: false = reference population.
    *
    * Scale posture: one (group, bin) count aggregation over the input —
    * the only row-weight exchange; totals and per-group PSI are
    * (groups x bins)-bounded and ride broadcasts. The term products run
    * in DECIMAL(38,0) (count*total*log wraps a long at ~1e16 rows).
    */
  def psiDrift(df: DataFrame, groupCols: Seq[Column], binCol: Column,
      isCurrent: Column, laplace: Long = 1L): DataFrame = {
    require(laplace >= 1, s"laplace must be >= 1, got $laplace")
    val reserved = Seq("bin", "n_ref", "n_cur", "term_bits", "psi_bits")
    require(!df.columns.exists(reserved.contains),
      s"input carries a reserved output column: " +
        df.columns.filter(reserved.contains).mkString(", "))
    val c = df.groupBy((groupCols :+ binCol.as("bin")): _*)
      .agg(sum(when(isCurrent, 0L).otherwise(1L)).as("n_ref"),
        sum(when(isCurrent, 1L).otherwise(0L)).as("n_cur"))
    val t = c.groupBy(groupCols: _*)
      .agg(sum(col("n_ref")).as("__NR"), sum(col("n_cur")).as("__NC"),
        count(lit(1)).as("__B"))
    val joined =
      if (groupCols.isEmpty) c.crossJoin(broadcast(t))
      else c.join(broadcast(t), groupCols.map(_.toString))
    val aR = col("n_ref") + laplace
    val aC = col("n_cur") + laplace
    val dR = col("__NR") + lit(laplace) * col("__B")
    val dC = col("__NC") + lit(laplace) * col("__B")
    val lg = Log2Fixed.expr(aR) + Log2Fixed.expr(dC) -
      Log2Fixed.expr(aC) - Log2Fixed.expr(dR)
    val termNum = dec(aR) * dec(dC) - dec(aC) * dec(dR)
    val terms = joined.select((groupCols ++ Seq(col("bin"), col("n_ref"),
      col("n_cur"), (termNum * dec(lg)).as("__term"),
      (dec(dR) * dec(dC) * Log2Fixed.One).as("__den"))): _*)
      .localCheckpoint() // feeds both the per-bin rows and the group total
    val psi = terms.groupBy(groupCols: _*)
      .agg(sum(col("__term")).as("__psum"), max(col("__den")).as("__pden"))
      .select((groupCols :+
        (microRound6(col("__psum"), col("__pden")).cast("double") / 1e6)
          .as("psi_bits")): _*)
    val out =
      if (groupCols.isEmpty) terms.crossJoin(broadcast(psi))
      else terms.join(broadcast(psi), groupCols.map(_.toString))
    out.select((groupCols ++ Seq(col("bin"), col("n_ref"), col("n_cur"),
      (microRound6(col("__term"), col("__den")).cast("double") / 1e6)
        .as("term_bits"),
      col("psi_bits"))): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group — the
    * distribution-level drift companion to [[psiDrift]] (PSI needs a
    * binning; KS reads the raw ECDFs and is invariant to any monotone
    * rescaling of the value): D = max over observed values v of
    * |ECDF_ref(v) − ECDF_cur(v)|, computed as ONE exact integer
    * numerator max |cumR·N_cur − cumC·N_ref| over the common
    * denominator N_ref·N_cur — no floats until the final micro-rounded
    * display. `ks_at` is the value where the gap peaks (smallest such
    * value on ties — deterministic). `significant` gates D against the
    * asymptotic two-sided 95% bound c(0.05)·√((n_ref+n_cur)/(n_ref·n_cur))
    * with c² = −ln(0.025)/2 pinned at 1.8444397 — compared in
    * cross-multiplied exact integers (D_num²·10⁷ vs 18444397·(n_ref+
    * n_cur)·n_ref·n_cur), never on the rounded display value. Groups
    * with an empty side report null ks/ks_at/significant, never a
    * plausible number.
    *
    * `groupCols` must be non-empty plain column references (the
    * per-segment drift grain; an ungrouped KS would plan the
    * unpartitioned-window scale-killer — pre-segment or add a literal
    * group upstream if one global test is really wanted... it isn't:
    * at 100 TB a single global ECDF walk serializes on one task).
    *
    * Scale posture: one (group, value) count aggregation over the input
    * (map-side combined — the only row-weight exchange); the ECDF walk
    * is a group-keyed running-sum window over DISTINCT values per group,
    * and the argmax is a struct-min aggregation, no second sort.
    * Envelope: the BINDING term is the significance gate's squared
    * numerator D_num²·10⁷ (D_num can reach n_ref·n_cur), which clears
    * DECIMAL(38,0) while n_ref·n_cur ≤ ~3·10¹⁵ — ≈ 5.6·10⁷ rows per
    * side balanced; the ks_stat itself holds to ~10¹⁹ rows/side. Both
    * engines fail loud past either bound (ANSI / HUGEINT) — pre-
    * aggregate or sample beyond it.
    */
  def ksTest(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
      isCurrent: Column): DataFrame = {
    require(groupCols.nonEmpty,
      "ksTest needs >= 1 group column (see scaladoc — an ungrouped KS " +
        "would plan an unpartitioned window)")
    val reserved = Seq("n_ref", "n_cur", "ks_stat", "ks_at", "significant")
    require(!df.columns.exists(reserved.contains),
      s"input carries a reserved output column: " +
        df.columns.filter(reserved.contains).mkString(", "))
    import org.apache.spark.sql.expressions.Window
    // null-flag rows are EXCLUDED from both arms (the kruskalWallis/
    // brierScore convention) — counting them into the reference arm
    // would inflate n_ref without any signal
    val c = df.filter(valueCol.isNotNull && isCurrent.isNotNull)
      .groupBy((groupCols :+ valueCol.cast("long").as("__v")): _*)
      .agg(sum(when(isCurrent, 0L).otherwise(1L)).as("__r"),
        sum(when(isCurrent, 1L).otherwise(0L)).as("__c"))
    val w = Window.partitionBy(groupCols: _*)
    val run = w.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c
      .withColumn("__cr", sum(col("__r")).over(run))
      .withColumn("__cc", sum(col("__c")).over(run))
      .withColumn("__nr", sum(col("__r")).over(w))
      .withColumn("__nc", sum(col("__c")).over(w))
    val dnum = abs(dec(col("__cr")) * dec(col("__nc")) -
      dec(col("__cc")) * dec(col("__nr")))
    val agg = cum.groupBy(groupCols: _*)
      .agg(min(struct((dnum * -1).as("nd"), col("__v").as("v"))).as("__m"),
        max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"))
    val defined = col("n_ref") > 0 && col("n_cur") > 0
    val dMax = col("__m.nd") * -1
    agg.select((groupCols ++ Seq(col("n_ref"), col("n_cur"),
      when(defined, microRound6(dMax,
        dec(col("n_ref")) * dec(col("n_cur"))).cast("double") / 1e6)
        .as("ks_stat"),
      when(defined, col("__m.v")).as("ks_at"),
      when(defined, when(dMax * dMax * 10000000L >
          lit(18444397L) * (dec(col("n_ref")) + dec(col("n_cur"))) *
            dec(col("n_ref")) * dec(col("n_cur")), 1).otherwise(0))
        .as("significant"))): _*)
  }

  /** round(log10(1 + 1/d) * 1e6) for d = 1..9 — the Benford first-digit
    * law in the micro-unit convention; the same literal nine integers are
    * embedded in the oracle SQL. */
  val BenfordMicro: Seq[Long] =
    (1 to 9).map(d => Math.round(StrictMath.log10(1.0 + 1.0 / d) * 1e6))

  /** Benford first-digit audit of a positive integer column: observed
    * count and frequency per leading digit (all nine digits present —
    * zero-count digits still deviate) against the Benford expectation,
    * plus the total-variation distance TVD = sum |o_d/N - p_d| / 2
    * repeated per row — collapsed to ONE exact integer numerator
    * (sum |o_d*1e6 - N*p_micro|) over 2*N*1e6, the ECE trick.
    *
    * The leading digit comes from the integer's decimal STRING (integers
    * render identically in every engine; never take a float log10).
    * Non-positive values are rejected with a loud null-vs-count contract:
    * rows where the column is null or < 1 are excluded from N.
    *
    * Scale posture: one 9-ary count aggregation (map-side combined);
    * everything after is 9 rows.
    */
  def benfordAudit(df: DataFrame, intCol: Column): DataFrame = {
    val digits = df.select(intCol.cast("long").as("__v"))
      .filter(col("__v") >= 1)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val all = digits.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        element_at(typedLit(BenfordMicro), col("digit")).as("benford_micro"))
      .localCheckpoint() // feeds per-digit rows and the TVD total
    // N is needed before the |o*1e6 - N*p| terms: two tiny passes over
    // the 9-row digit table. N = 0 (no qualifying rows) fails LOUDLY —
    // the division would go silently null here and error in the oracle
    val n = all.agg(sum(col("n_obs")).as("__N0"))
      .select(when(col("__N0") > 0, col("__N0"))
        .otherwise(raise_error(
          lit("benfordAudit: no qualifying rows (intCol >= 1)"))).as("__N"))
    val withN = all.crossJoin(broadcast(n))
    val gap = abs(col("n_obs") * 1000000L - col("__N") * col("benford_micro"))
    val tvd = withN.agg(sum(gap).as("__g"), max(col("__N")).as("__N2"))
      .select((microRound6(col("__g"), col("__N2") * 2000000L)
        .cast("double") / 1e6).as("tvd"))
    withN.select(col("digit"), col("n_obs"),
        (microRound6(col("n_obs"), col("__N")).cast("double") / 1e6)
          .as("obs_freq"),
        (col("benford_micro").cast("double") / 1e6).as("benford_freq"),
        gap.as("gap_num"))
      .crossJoin(broadcast(tvd))
  }
}
