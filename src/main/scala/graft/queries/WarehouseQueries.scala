package graft.queries

import graft.core.Tables
import graft.functions.{Geohash, TextFunctions}
import graft.operators.{Chunker, EvalMetrics, Graph, Journey, RangeJoin, Sketches, TableOps}
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
  private def docs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "documents")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** q172's funnel definition: stage order + anchor window (72 h). */
  private val funnelStages = Seq("signup", "view", "click", "purchase")
  private val funnelWindowSec = 259200L

  /** The q145/q178/q189 deterministic link graph: 1–3 out-links per doc,
    * target (id·31+j) mod N, self-loops bumped. ONE definition — the
    * Spark side and the oracle CTE text below must stay in lockstep.
    */
  private[queries] def docLinkEdges(d: DataFrame): DataFrame = {
    val cnt = d.agg(count(lit(1)).cast("long").as("__n"))
    d.crossJoin(broadcast(cnt))
      .select(col("doc_id").as("src"),
        explode(transform(
          sequence(lit(1L), lit(1L) + pmod(col("doc_id"), lit(3L))),
          j => {
            val t0 = pmod(col("doc_id") * 31 + j, col("__n"))
            when(t0 === col("doc_id"), pmod(t0 + 1, col("__n"))).otherwise(t0)
          })).as("dst"))
  }

  /** Oracle twin of [[docLinkEdges]]: CTEs `nn`, `e0`, `e`. */
  private[queries] val linkEdgeCtesSql =
    """nn AS (SELECT COUNT(*) AS n FROM documents),
       e0 AS (SELECT doc_id AS src, u.j, n
         FROM documents, nn, unnest(range(1, 2 + doc_id % 3)) AS u(j)),
       e AS (SELECT src, CASE WHEN (src*31 + j) % n = src
           THEN ((src*31 + j) % n + 1) % n
           ELSE (src*31 + j) % n END AS dst FROM e0)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Lagged cross-correlation of the daily view-count and purchase-count
    // series at lags 0..3 — "do purchases follow views with a delay?" —
    // Pearson r^2 as an exact integer rational (squaring clears the
    // sqrt), direction in cov_sign.
    "q228_lag_correlation" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
        .select(datediff(col("day"), lit("1970-01-01").cast("date"))
          .as("day_num"), col("n_view"), col("n_purchase"))
      Journey.lagCorrelation(daily, col("day_num"), col("n_view"),
        col("n_purchase"), maxLag = 3)
    }),

    // Two-proportion A/B gate: users split by id parity, conversion =
    // ever purchased; z^2 (chi-square form) as an exact rational with the
    // 95% significance flag decided on the UNROUNDED statistic.
    "q229_ab_test" -> ((s, dir) => {
      val users = ev(s, dir).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      EvalMetrics.twoProportionTest(users,
        pmod(col("user_id"), lit(2)) === 1, col("converted") === 1)
    }),

    // First-order Markov transition matrix of user event streams:
    // (prev -> next) counts over (ts, event_id)-ordered per-user events,
    // probabilities micro-rounded per source symbol.
    "q230_markov_transitions" -> ((s, dir) =>
      Journey.markovTransitions(ev(s, dir), col("user_id"), col("ts"),
        col("event_id"), col("event_type"))),

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
    }),

    // Snapshot diff: two overlapping date-sliced loads of orders with
    // deterministic mutations in the newer one; full-outer key join →
    // added/removed/changed/unchanged + differing-column list.
    "q175_snapshot_diff" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          dec(col("o_totalprice")).as("price"),
          col("o_orderpriority").as("priority"), col("o_orderdate"))
      val snapA = o.filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .drop("o_orderdate")
      val snapB = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .withColumn("price",
          when(col("o_orderkey") % 7 === 0, col("price") + 1).otherwise(col("price")))
        .withColumn("priority",
          when(col("o_orderkey") % 11 === 0, lit("9-MUTATED")).otherwise(col("priority")))
        .drop("o_orderdate")
      TableOps.snapshotDiff(snapA, snapB, Seq("o_orderkey"),
          Seq("o_orderstatus", "price", "priority"))
        .groupBy(col("change_type"), col("changed_cols"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
    }),

    // One-pass column profile (nulls / exact distinct / min / max) over a
    // projection that plants nulls via NULLIF; long-format output.
    "q176_column_profile" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"),
          expr("nullif(o_orderpriority, '1-URGENT')").as("priority_nullable"),
          col("o_custkey"), dec(col("o_totalprice")).as("price"))
      TableOps.columnProfile(o,
        Seq("o_orderstatus", "priority_nullable", "o_custkey", "price"))
    }),

    // Count-min sketch over the token stream (portable poly31 index
    // stream, so every register is oracle-checked), probed at the 10
    // most frequent tokens: est = min over depth rows, always ≥ exact.
    "q177_countmin" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      val regs = Sketches.countMinRegisters(toks, col("w"), depth = 3, width = 512)
      val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_n"))
      val probes = exact.orderBy(col("exact_n").desc, col("w").asc).limit(10)
      Sketches.cmEstimates(regs, probes, col("w"), depth = 3, width = 512)
        .select(col("w").as("token"), col("exact_n"), col("cm_est"))
    }),

    // HyperLogLog registers per language over the 60-bit md5-prefix
    // token hash (avalanche for the leading-zero statistic) — rho via
    // exact bin()-length arithmetic, no float log2, so the whole
    // register table is on the hash-checked surface (the estimate's
    // float math stays spec-gated in SketchesSpec).
    "q179_hll_registers" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("w"))
      Sketches.hllRegisters(toks, Seq(col("lang")), col("w"), p = 6)
    }),

    // Exact triangle counting by degree-ordered orientation over the
    // q145 arithmetic link graph; output = triangle-participation
    // histogram. Orientation bounds wedge fan-out at O(√m) out-degree —
    // the shape that survives hub vertices at 100 TB.
    "q178_triangle_count" -> ((s, dir) =>
      Graph.triangleCount(docLinkEdges(docs(s, dir)), col("src"), col("dst"))
        .groupBy(col("n_tri")).agg(count(lit(1)).as("n_vertices"))),

    // Sentence-aware greedy chunking (20-token budget): the RAG chunker
    // that respects sentence boundaries; whole pipeline is one narrow
    // projection (split → count → greedy fold → posexplode), no shuffle.
    // The synthetic texts carry no terminators (1.0 sentences/doc), so —
    // q142's decoration precedent — the query plants a period after
    // every 7th token first; every fold branch then triggers for real.
    "q180_sentence_chunks" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val dotted = array_join(
        transform(toks, (x, i) =>
          when((i + 1) % 7 === 0, concat(x, lit("."))).otherwise(x)), " ")
      Chunker.sentenceChunks(
          docs(s, dir).select(col("doc_id"), dotted.as("text")),
          col("text"), budgetTokens = 20)
        .select(col("doc_id"), col("chunk_idx"),
          col("n_sentences"), col("n_tokens"))
    }),

    // Section-aware hierarchical chunking: docs rendered as markdown
    // (every 4th 5-token line becomes a # / ## heading by deterministic
    // arithmetic — docs ship no structure), then split so every body
    // line carries its heading PATH; an ## under a new # must NOT leak
    // the previous #'s subsection (the h1-ordinal guard — both branches
    // live). The oracle replays the render, the running-scope windows
    // and the ordered reassembly.
    "q216_section_chunks" -> ((s, dir) => {
      val id = col("doc_id")
      val lines0 = CurationQueries.tokenChunkLines(col("text"), 5)
      val decorated = transform(lines0, (l, i) => {
        val g = floor(i / lit(4)).cast("long")
        when(pmod(i, lit(4)) === 0,
          when(pmod(g + id, lit(3)) === 0,
            concat(lit("# Part "), g.cast("string")))
            .otherwise(concat(lit("## Sub "), g.cast("string"))))
          .otherwise(l)
      })
      val md = array_join(decorated, "\n")
      Chunker.sectionChunks(
        docs(s, dir).select(id, md.as("md")), col("doc_id"), col("md"))
    }),

    // Flesch–Kincaid readability (the lightweight education-level proxy
    // next to the learned q136 scorer): periods planted every 7th token
    // (q180's decoration — the synthetic docs carry no terminators),
    // vowel-group syllables, portable-half-up 2dp grade. The oracle
    // replays words, sentences, every per-word syllable count and the
    // grade formula in the identical double-op order.
    "q218_readability" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val dotted = array_join(
        transform(toks, (x, i) =>
          when((i + 1) % 7 === 0, concat(x, lit("."))).otherwise(x)), " ")
      graft.operators.QualityRules.readability(
        docs(s, dir).select(col("doc_id"), dotted.as("text")),
        col("doc_id"), col("text"))
    }),

    // HLL merge law on the oracle surface: per-language register tables
    // merged bucket-wise (max rho) == registers computed directly over
    // the union. The reason sketches win at 100 TB — per-shard tables
    // merge with one tiny agg instead of re-shuffling raw values.
    "q181_hll_merge" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("w"))
      Sketches.hllMerge(
        Sketches.hllRegisters(toks, Seq(col("lang")), col("w"), p = 6), Nil)
    }),

    // Order-independent content digest of orders (one narrow pass + a
    // 1-row agg — the migration-validation primitive); NULLIF plants a
    // null to exercise the sentinel rendering.
    "q182_content_digest" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("string").as("c1"),
        col("o_custkey").cast("string").as("c2"),
        col("o_orderstatus").as("c3"),
        dec(col("o_totalprice")).cast("string").as("c4"),
        expr("nullif(o_orderpriority, '1-URGENT')").as("c5"),
        tstr(col("o_orderdate")).as("c6"))
      TableOps.contentDigest(o, Seq("c1", "c2", "c3", "c4", "c5", "c6"))
    }),

    // Banded interval×interval overlap join (events widened to
    // deterministic durations, even vs odd event ids): per-user overlap
    // pair counts + total overlap micros. The bin-of-overlap-start rule
    // emits each pair exactly once — no distinct pass.
    "q183_interval_overlap" -> ((s, dir) => {
      val iv = ev(s, dir).select(col("event_id"), col("user_id"), col("ts"),
        timestamp_micros(unix_micros(col("ts")) +
          (lit(60L) + col("event_id") % 240) * 1000000L).as("te"))
      val l = iv.filter(col("event_id") % 2 === 0)
        .select(col("event_id").as("l_id"), col("user_id").as("l_user"),
          col("ts").as("l_s"), col("te").as("l_e"))
      val r = iv.filter(col("event_id") % 2 === 1)
        .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
          col("ts").as("r_s"), col("te").as("r_e"))
      RangeJoin.intervalOverlap(
          l, col("l_user"), col("l_s"), col("l_e"),
          r, col("r_user"), col("r_s"), col("r_e"),
          binWidthSeconds = 300)
        .groupBy(col("l_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(unix_micros(least(col("l_e"), col("r_e"))) -
            unix_micros(greatest(col("l_s"), col("r_s"))))
            .as("overlap_us_sum"))
    }),

    // Equal-width 20-bin histogram over order totals in cents — pure
    // integer bin arithmetic, exact cross-engine replay.
    "q184_histogram" -> ((s, dir) =>
      TableOps.histogramInt(
        Tables.load(s, dir, "orders")
          .select((dec(col("o_totalprice")) * 100).cast("long").as("cents")),
        col("cents"), nBins = 20)),

    // Characteristic terms per language: tf·idf in the repo's fixed-point
    // log2 (q125's idf discipline) — integer-exact, so the full ranking
    // is on the hash-checked surface. Top-5 per lang, WindowGroupLimit-
    // compiled.
    "q185_top_terms" -> ((s, dir) => {
      import graft.functions.Log2Fixed
      import org.apache.spark.sql.expressions.Window
      val t = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("w"))
      val tf = t.groupBy(col("lang"), col("w")).agg(count(lit(1)).as("tf"))
      val dfs = t.select(col("doc_id"), col("w")).distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      val lgn = docs(s, dir).agg(count(lit(1)).as("n"))
        .select(Log2Fixed.expr(col("n")).as("lgn"))
      val scored = tf.join(dfs, "w").crossJoin(broadcast(lgn))
        .select(col("lang"), col("w").as("term"), col("tf"), col("df"),
          ((col("lgn") - Log2Fixed.expr(col("df"))) * col("tf")).as("score_fp"))
      scored
        .withColumn("rnk", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("score_fp").desc, col("term").asc)))
        .filter(col("rnk") <= 5)
    }),

    // Exact sufficient statistics (moments) per event type: n, Σx, Σx²,
    // Σxy over integer cents and event hour — DECIMAL(38,0) sums
    // rendered as strings, so mean/variance/covariance derive exactly
    // downstream with zero float drift on the checked surface.
    "q186_moment_stats" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_type"),
        (dec(col("value")) * 100).cast("long").as("x"),
        hour(col("ts")).cast("long").as("y"))
      // widen BEFORE the multiply (the oracle's HUGEINT discipline) — a
      // long×long product would wrap past |x| ≈ 3e9 cents
      val xw = col("x").cast("decimal(38,0)")
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(xw).cast("string").as("sum_x"),
          sum(xw * col("x")).cast("string").as("sum_x2"),
          sum(col("y").cast("decimal(38,0)")).cast("string").as("sum_y"),
          sum(xw * col("y")).cast("string").as("sum_xy"))
    }),

    // Equal-frequency (quantile) binning via the two-stage distributed
    // prefix sum — NO global-order window (the guard-banned shape);
    // value-quantile semantics so ties never straddle bins.
    "q187_quantile_bins" -> ((s, dir) =>
      TableOps.equalFrequencyBins(
        Tables.load(s, dir, "orders")
          .select((dec(col("o_totalprice")) * 100).cast("long").as("cents")),
        col("cents"), nBins = 20)),

    // MATCH_RECOGNIZE-lite: per-user ordered event-initial strings, then
    // sequence patterns as plain regexes — converted (signup…purchase),
    // error bursts (ee), and view→purchase adjacency counts.
    "q188_sequence_match" -> ((s, dir) => {
      val seqs = Journey.eventSequence(ev(s, dir), col("user_id"), col("ts"),
        col("event_id"), expr("substring(event_type, 1, 1)"))
      seqs
        .select(
          col("seq").rlike("s.*p").cast("int").as("converted"),
          col("seq").rlike("ee").cast("int").as("err_burst"),
          ((length(col("seq")) -
            length(regexp_replace(col("seq"), "vp", ""))) / 2)
            .cast("long").as("n_vp"))
        .groupBy(col("converted"), col("err_burst"))
        .agg(count(lit(1)).as("n_users"), sum(col("n_vp")).as("sum_vp"))
    }),

    // Synchronous label propagation (3 unrolled rounds, min-label ties)
    // over the q145 arithmetic link graph → community-size histogram.
    "q189_label_prop" -> ((s, dir) => {
      val d = docs(s, dir)
      Graph.labelPropagation(d.select(col("doc_id")), col("doc_id"),
          docLinkEdges(d), col("src"), col("dst"), rounds = 3)
        .groupBy(col("label")).agg(count(lit(1)).as("community_size"))
        .groupBy(col("community_size"))
        .agg(count(lit(1)).as("n_communities"))
    }),

    // Fixed-point EWMA (alpha = 1/4) of event value cents per user —
    // the recursion in exact integers, seeded with the first value.
    "q190_ewma" -> ((s, dir) =>
      Journey.ewmaFixed(ev(s, dir), col("user_id"), col("ts"),
          col("event_id"), (dec(col("value")) * 100).cast("long"), d = 4)
        .select(col("key").as("user_id"), col("n"), col("ewma_fp"))),

    // Holt double-exponential smoothing (alpha = 1/4, beta = 1/5) of
    // event value cents per user — q190's trend companion: level AND
    // slope in exact fixed point, floor-div both engines (the trend
    // goes negative on declining series).
    "q254_holt" -> ((s, dir) =>
      Journey.holtFixed(ev(s, dir), col("user_id"), col("ts"),
          col("event_id"), (dec(col("value")) * 100).cast("long"),
          da = 4, db = 5)
        .select(col("key").as("user_id"), col("n"), col("level_fp"),
          col("trend_fp"), col("forecast_fp"))),

    // Holt–Winters additive (alpha = 1/4, beta = 1/5, gamma = 1/3,
    // period 4) — q254's seasonal companion: level + trend + a
    // period-4 seasonal vector, exact fixed point end to end.
    "q256_holt_winters" -> ((s, dir) =>
      Journey.holtWintersFixed(ev(s, dir), col("user_id"), col("ts"),
          col("event_id"), (dec(col("value")) * 100).cast("long"),
          period = 4, da = 4, db = 5, dc = 3)
        .select(col("key").as("user_id"), col("n"), col("level_fp"),
          col("trend_fp"), col("season_fp"), col("forecast_fp"))),

    // Exact z-score outliers (k=3) per event type — the test cleared of
    // division, evaluated in DECIMAL(38,0), boundary rows deterministic.
    "q191_outliers" -> ((s, dir) =>
      TableOps.exactOutliers(
          ev(s, dir).select(col("event_type"),
            (dec(col("value")) * 100).cast("long").as("x")),
          col("event_type"), col("x"), k = 3)
        .select(col("g").as("event_type"), col("n"), col("n_outliers"))),

    // Count-min merge law (the sum twin of q181's max): per-source
    // register tables merged == registers of the union, oracle-pinned.
    "q192_cms_merge" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("w"))
      Sketches.cmMerge(
        Sketches.countMinRegisters(toks, col("w"), depth = 3, width = 512,
          groupCols = Seq(col("source"))))
    }),

    // Item-item co-purchase top-k: within-basket pairs (quadratic ONLY
    // in basket size, never corpus size), symmetric expand, top-3
    // partners per item — WindowGroupLimit-compiled.
    "q193_copurchase" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      basketOrderedPairs(Tables.load(s, dir, "lineitem"))
        .withColumn("rnk", row_number().over(Window.partitionBy(col("item"))
          .orderBy(col("c_ab").desc, col("partner").asc)))
        .filter(col("rnk") <= 3)
    }),

    // Association lift in fixed point: lift_fp = c_ab·n·10⁶ div
    // (c_a·c_b) — integer-exact ranking, min support 3, global top-20
    // (TakeOrdered, no global window).
    "q194_basket_lift" -> ((s, dir) => {
      val li = baskets(Tables.load(s, dir, "lineitem"))
      val n = li.agg(count_distinct(col("ok")).as("n_orders"))
      val itemCnt = li.groupBy(col("pk")).agg(count(lit(1)).as("c_item"))
      basketPairs(Tables.load(s, dir, "lineitem"))
        .filter(col("c_ab") >= 3)
        .join(broadcast(itemCnt.select(col("pk").as("p1"), col("c_item").as("c_a"))), "p1")
        .join(broadcast(itemCnt.select(col("pk").as("p2"), col("c_item").as("c_b"))), "p2")
        .crossJoin(broadcast(n))
        .select(col("p1"), col("p2"), col("c_ab"), col("c_a"), col("c_b"),
          expr("(c_ab * n_orders * 1000000) div (c_a * c_b)").as("lift_fp"))
        .orderBy(col("lift_fp").desc, col("p1").asc, col("p2").asc)
        .limit(20)
    }),

    // Integer geohash encoding (canonical cells + base32) over
    // deterministic milli-degree coordinates — geo rollup by 2-char
    // prefix. Exact integer arithmetic end to end; the Morton ladder is
    // q144's, the alphabet walk plain string ops.
    "q195_geohash" -> ((s, dir) => {
      val pts = geoPoints(ev(s, dir))
      pts.select(col("event_id"),
          Geohash.encode(col("lat_m"), col("lng_m"), chars = 6).as("gh"))
        .groupBy(substring(col("gh"), 1, 2).as("prefix"))
        .agg(count(lit(1)).as("n"),
          min(col("gh")).as("gh_min"), max(col("gh")).as("gh_max"))
    }),

    // Planar radius pairs via neighbor-cell geo join: left side explodes
    // its 3×3 neighbor cells (cell edge >= radius, so every qualifying
    // pair meets in the right point's single cell EXACTLY once — no
    // dedup), exact integer squared-distance filter. The geodesic form
    // is float trig and stays off the hash surface by design.
    "q196_geo_pairs" -> ((s, dir) => {
      val bits = 7
      val r = 1200L
      val pts = geoPoints(ev(s, dir)).filter(col("event_id") < 3000)
        .select(col("event_id").as("id"), col("lat_m"), col("lng_m"),
          Geohash.latCell(col("lat_m"), bits).as("latc"),
          Geohash.lngCell(col("lng_m"), bits).as("lngc"))
      val l = pts.select(col("id").as("l_id"), col("lat_m").as("l_lat"),
          col("lng_m").as("l_lng"),
          explode(array((for (a <- -1 to 1; b <- -1 to 1) yield
            struct((col("latc") + a).as("latc"), (col("lngc") + b).as("lngc"))): _*))
            .as("c"))
        .select(col("l_id"), col("l_lat"), col("l_lng"),
          col("c.latc").as("latc"), col("c.lngc").as("lngc"))
      val rgt = pts.select(col("id").as("r_id"), col("lat_m").as("r_lat"),
        col("lng_m").as("r_lng"), col("latc"), col("lngc"))
      l.join(rgt, Seq("latc", "lngc"))
        .filter(col("l_id") < col("r_id"))
        .select(col("l_id"), col("r_id"),
          ((col("l_lat") - col("r_lat")) * (col("l_lat") - col("r_lat")) +
            (col("l_lng") - col("r_lng")) * (col("l_lng") - col("r_lng")))
            .as("d2"))
        .filter(col("d2") <= r * r)
        .agg(count(lit(1)).as("n_pairs"), sum(col("d2")).as("sum_d2"),
          count_distinct(col("l_id")).as("n_left"))
    }),

    // The EXACT reference clean_document pipeline (DATA:455-542) end to
    // end, hash-checked: docs decorated with every line class the
    // reference handles (page numbers, repeated headers across the
    // >=20-line gate, share/license noise, markdown-link-dense lines,
    // copyright-near-end, half-width editor credits), then
    // TextFunctions.cleanDocument vs a fully relational DuckDB replay
    // of all four stages. maxChars=150 exercises the labeled marker.
    "q197_clean_document" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      val lines0 = transform(
        sequence(lit(0), greatest(lit(0), expr("(size(toks)+1) div 2 - 1"))),
        i => array_join(slice(col("toks"), i * 2 + 1, lit(2)), " "))
      val decorated = transform(lines0, (l, i) =>
        when(i % 6 === 2, concat(lit("- "), i.cast("string"), lit(" -")))
          .when(i % 10 === 0, lit("页眉 HEADER-X"))
          .when(i % 7 === 3, concat(lit("分享到 "), l))
          .when(i % 9 === 4, lit("[a](u1) [b](u2) [c](u3)"))
          .when(i % 13 === 6, concat(l, lit(" 版权所有")))
          .when(i % 11 === 5, concat(l, lit(" (责任编辑：张三)")))
          .otherwise(l))
      t.select(col("doc_id"),
          TextFunctions.cleanDocument(
            array_join(decorated, "\n"), maxChars = 150).as("text_clean"))
        .withColumn("n_chars", length(col("text_clean")))
    }),

    // One-sided CUSUM drift monitor per user over value cents — exact
    // integer statistic with alarm-restart, oracle-replayed fold.
    "q198_cusum" -> ((s, dir) =>
      Journey.cusum(ev(s, dir), col("user_id"), col("ts"), col("event_id"),
          (dec(col("value")) * 100).cast("long"),
          target = 6000L, threshold = 30000L)
        .select(col("key").as("user_id"), col("n"),
          col("n_alarms"), col("final_s"))),

    // Wald SPRT replay per event type: "stop the experiment at the first
    // crossing" over the time-ordered high-value stream, H0 p=0.20 vs
    // H1 p=0.30 at α=β=0.05. The success bar is per-type (purchase and
    // signup clear at 50.00, the rest at 90.00 — true rates ~0.37 vs
    // ~0.16), so BOTH verdicts land: hot feeds accept H1, cold feeds
    // accept H0, each at its measured stopping time.
    "q288_sprt" -> ((s, dir) => {
      val (l1, l0, bound) = Journey.sprtConstants(0.20, 0.30, 0.05, 0.05)
      val cents = (dec(col("value")) * 100).cast("long")
      val cut = when(col("event_type").isin("purchase", "signup"), 5000L)
        .otherwise(9000L)
      Journey.sprt(ev(s, dir).filter(col("value").isNotNull),
        Seq(col("event_type")), col("ts"), col("event_id"),
        (cents >= cut).cast("long"), l1, l0, bound)
    }),

    // Empirical-Bayes shrinkage of per-user purchase rates — the
    // "don't rank a 2-for-3 user above a 200-for-400 user" stabilizer:
    // beta-binomial method of moments gives the population prior
    // (mean + pseudo-observation strength), every user's raw rate is
    // pulled toward it in proportion to their evidence. Exact
    // quantization chain, every floor replicated in the oracle.
    "q289_eb_shrinkage" -> ((s, dir) =>
      TableOps.ebShrinkRates(
        ev(s, dir).filter(col("user_id").isNotNull),
        Seq(col("user_id")),
        (col("event_type") === "purchase").cast("long"))),

    // Wilson score bounds per event type: the CONSERVATIVE high-value
    // rate ranking (sort by lower bound) next to q289's EB shrinkage —
    // one integer sqrt (float seed ± 2 exact correction, the q276
    // pattern), every floor replicated in the oracle.
    "q292_wilson_rates" -> ((s, dir) => {
      val cents = (dec(col("value")) * 100).cast("long")
      TableOps.wilsonLowerBound(
        ev(s, dir).filter(col("value").isNotNull),
        Seq(col("event_type")), (cents >= 5000L).cast("long"))
    }),

    // CUPED variance reduction over a stride A/B split: covariate x =
    // each user's FIRST-half spend (by the corpus day midpoint), outcome
    // y = second-half spend; theta pooled, micro-quantized once, each
    // arm's adjusted mean one exact rational. Arms ride the stride
    // quotient (user_id div 20) % 2 — never a raw modulus (the testdata
    // round-robin trap).
    "q293_cuped" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val day = datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      val cents = (dec(col("value")) * 100).cast("long")
      val rng = e.agg(min(day).as("__mn"), max(day).as("__mx"))
        .select(expr("(__mn + __mx + 1) div 2").as("__mid"))
      val u = e.crossJoin(broadcast(rng))
        .groupBy(col("user_id"))
        .agg(sum(when(day < col("__mid"), cents).otherwise(0L)).as("x"),
          sum(when(day >= col("__mid"), cents).otherwise(0L)).as("y"))
      TableOps.cuped(
        u.select(pmod(expr("user_id div 20"), lit(2)).as("arm"),
          col("x"), col("y")),
        Seq(col("arm")), col("x"), col("y"))
    }),

    // Difference-in-differences over q293's exact layout (stride-
    // quotient arms, corpus-day-midpoint period split): DID =
    // (post_T − pre_T) − (post_C − pre_C) of the per-user mean spends —
    // the quasi-experimental companion to CUPED (CUPED shrinks variance
    // inside a randomized split; DID removes arm level + common time
    // trend when the split was NOT randomized, under parallel trends).
    // Means micro-rounded once each (signed), DID exact on the four
    // micro integers.
    "q298_diff_in_diff" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val day = datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      val cents = (dec(col("value")) * 100).cast("long")
      val rng = e.agg(min(day).as("__mn"), max(day).as("__mx"))
        .select(expr("(__mn + __mx + 1) div 2").as("__mid"))
      TableOps.diffInDiff(
        e.crossJoin(broadcast(rng)),
        col("user_id"),
        pmod(expr("user_id div 20"), lit(2)),
        day >= col("__mid"),
        cents)
    }),

    // Kaplan–Meier life table (integer-exact): time-to-conversion with
    // right-censoring — duration = days from a user's first event to
    // their first HIGH-VALUE purchase ("event"), or to their last event
    // when they never convert (right-censored). At each distinct duration: n_risk
    // (users surviving >= d, via a broadcast triangular join over the
    // BOUNDED duration table — no single-partition window), n_event,
    // n_censored. The survival product is float by nature and stays off
    // the hash surface; the life table — the estimator's whole input —
    // is exact.
    "q200_life_table" -> ((s, dir) => {
      val spans = ev(s, dir).groupBy(col("user_id"))
        .agg(
          datediff(
            coalesce(
              min(when(col("event_type") === "purchase" &&
                col("value") >= 150, col("ts"))),
              max(col("ts"))),
            min(col("ts"))).as("dur"),
          max((col("event_type") === "purchase" &&
            col("value") >= 150).cast("int")).as("event"))
      val byDur = spans.groupBy(col("dur"))
        .agg(sum(col("event")).cast("long").as("n_event"),
          sum(lit(1) - col("event")).cast("long").as("n_censored"),
          count(lit(1)).as("n_at"))
      val risk = byDur.select(col("dur"), col("n_at"))
        .join(broadcast(byDur.select(col("dur").as("d2"), col("n_at").as("c2"))),
          col("d2") >= col("dur"))
        .groupBy(col("dur")).agg(sum(col("c2")).as("n_risk"))
      byDur.join(broadcast(risk), "dur")
        .select(col("dur"), col("n_risk"), col("n_event"), col("n_censored"))
    }),

    // Last-touch revenue attribution through the CUSTOM as-of exec
    // (AsofMergeJoinExec): each purchase attributed to the user's most
    // recent click within 7 days; revenue rolled up by attribution.
    "q199_attribution" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), (dec(col("value")) * 100).cast("long").as("cents"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.operators.AsofJoin.backwardMerge(
          purchases, clicks, Seq("p_user"), Seq("c_user"), "p_ts", "c_ts",
          rightTiebreak = Some("c_id"))
        .withColumn("attributed",
          (col("c_id").isNotNull &&
            unix_micros(col("p_ts")) - unix_micros(col("c_ts")) <=
              7L * 86400L * 1000000L).cast("int"))
        .groupBy(col("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"),
          count_distinct(col("p_user")).as("n_users"))
    }))

  /** The q193/q194 basket layer: distinct (order, part) memberships. */
  private def baskets(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** One sorted item array per order — the shared scan for the basket
    * queries. collect_set dedups (ok,pk) with map-side partial merge, so
    * the one order-keyed exchange carries each membership once (the same
    * bytes the old distinct() moved, minus the second pass).
    */
  private def basketArrays(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("ps"))

  /** Within-basket co-occurrence pairs — quadratic ONLY in basket size.
    * ONE definition for both market-basket queries (and the SQL CTE
    * constant below must stay its textual twin).
    *
    * r13: the li-self-join form re-scanned lineitem twice and paid two
    * distinct exchanges + a join per use (and q193's symmetric union
    * DUPLICATED the whole subtree: 4 scans / 7 exchanges). Pair expansion
    * is now a codegen HOF over the per-order sorted array (ascending, so
    * p1 < p2 by construction — the join's `a.pk < b.pk`), and the pair
    * aggregation collapses map-side before its exchange: 1 scan,
    * 2 data-sized exchanges. Bit-identical counts; same oracle CTE.
    */
  private def basketPairs(lineitem: DataFrame): DataFrame =
    basketArrays(lineitem)
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("c_ab"))

  /** q193's symmetric (item, partner) pairs generated DIRECTLY (k·(k-1)
    * structs per basket) instead of unionAll over [[basketPairs]] — the
    * union re-executed the entire pair subtree per arm. Pairs here are
    * ~all-distinct (1.196M of 1.2M at sf0.1), so map-side partial agg
    * collapses nothing; the explicit repartition on `item` makes the pair
    * aggregation AND q193's rank window share ONE exchange
    * (HashPartitioning(item) satisfies ClusteredDistribution(item,
    * partner), and the agg preserves it for the window). No sort_array:
    * pair order is irrelevant under the terminal aggregation.
    */
  private def basketOrderedPairs(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
      .select(explode(flatten(transform(col("ps"), x =>
        transform(filter(col("ps"), y => y =!= x),
          y => struct(x.as("item"), y.as("partner")))))).as("pr"))
      .select(col("pr.item").as("item"), col("pr.partner").as("partner"))
      .repartition(col("item"))
      .groupBy(col("item"), col("partner")).agg(count(lit(1)).as("c_ab"))

  /** Oracle twin of [[baskets]]/[[basketPairs]]: CTEs `li`, `pairs`. */
  private val basketPairsCtesSql =
    """li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       pairs AS (SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS c_ab
         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         GROUP BY 1, 2)"""

  /** Deterministic milli-degree coordinates for the geo queries. */
  private def geoPoints(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      (pmod(col("user_id") * 48271L + col("event_id") * 31L, lit(180001L)) -
        90000L).as("lat_m"),
      (pmod(col("event_id") * 69621L + col("user_id") * 7L, lit(360001L)) -
        180000L).as("lng_m"))

  /** Oracle twin of [[geoPoints]]. */
  private val geoPointsSql =
    """pts AS (SELECT event_id,
        (user_id * 48271 + event_id * 31) % 180001 - 90000 AS lat_m,
        (event_id * 69621 + user_id * 7) % 360001 - 180000 AS lng_m
      FROM events)"""

  /** The bit-spread ladder's canonical SQL twin (Layout owns it). */
  private def spreadSql(v: String): String =
    graft.operators.Layout.bitSpreadSql(v)

  /** The q189 oracle's unrolled LPA rounds. */
  private def lpaRoundSql(i: Int): String = {
    val prev = s"l${i - 1}"
    s"""r${i}n AS (SELECT bi.n, l.label, COUNT(*) AS cnt
         FROM bi JOIN $prev l ON bi.nb = l.id GROUP BY 1, 2),
       r${i}p AS (SELECT n AS id, label AS newl FROM
           (SELECT *, ROW_NUMBER() OVER (PARTITION BY n
              ORDER BY cnt DESC, label) AS rk FROM r${i}n) WHERE rk = 1),
       l$i AS (SELECT p.id, COALESCE(r${i}p.newl, p.label) AS label
         FROM $prev p LEFT JOIN r${i}p ON p.id = r${i}p.id)"""
  }

  private val cmMults = Sketches.cmMultipliers(3)
  private val cmDdSql =
    s"(SELECT * FROM (VALUES (0, ${cmMults(0)}), (1, ${cmMults(1)}), " +
      s"(2, ${cmMults(2)})) v(d, m))"

  private val funnelWinUs = funnelWindowSec * 1000000L

  val oracles: Map[String, String] = Map(

    "q216_section_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${AnalyticsQueries.toksSql} AS toks
           FROM documents),
         d0 AS (SELECT doc_id, ${CurationQueries.chunkLinesSql(5)} AS lines
           FROM t),
         l AS (SELECT doc_id, u.i - 1 AS pos,
             CASE WHEN (u.i - 1) % 4 = 0 THEN
               CASE WHEN ((u.i - 1) // 4 + doc_id) % 3 = 0
                 THEN '# Part ' || ((u.i - 1) // 4)
                 ELSE '## Sub ' || ((u.i - 1) // 4) END
               ELSE lines[u.i] END AS ln
           FROM d0, unnest(range(1, len(lines) + 1)) AS u(i)),
         g AS (SELECT doc_id, pos, ln,
             CASE WHEN ln LIKE '## %' THEN 2
                  WHEN ln LIKE '# %' THEN 1 ELSE 0 END AS typ
           FROM l),
         w1 AS (SELECT doc_id, pos, ln, typ,
             SUM(CASE WHEN typ > 0 THEN 1 ELSE 0 END) OVER win AS section_id,
             SUM(CASE WHEN typ = 1 THEN 1 ELSE 0 END) OVER win AS h1cnt
           FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         w2 AS (SELECT doc_id, pos, ln, typ, section_id, h1cnt,
             LAST_VALUE(CASE WHEN typ = 1 THEN substr(ln, 3) END IGNORE NULLS)
               OVER win AS h1,
             LAST_VALUE(CASE WHEN typ = 2
                 THEN {'c': h1cnt, 't': substr(ln, 4)} END IGNORE NULLS)
               OVER win AS h2s
           FROM w1 WINDOW win AS (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT doc_id, CAST(section_id AS BIGINT) AS section_id,
           MAX(h1) AS h1,
           MAX(CASE WHEN h2s.c = h1cnt THEN h2s.t END) AS h2,
           CAST(COUNT(CASE WHEN typ = 0 THEN 1 END) AS BIGINT) AS n_lines,
           COALESCE(string_agg(CASE WHEN typ = 0 THEN ln END, chr(10)
             ORDER BY pos), '') AS body
         FROM w2 GROUP BY doc_id, section_id""",

    "q218_readability" ->
      s"""WITH t AS (SELECT doc_id, ${AnalyticsQueries.toksSql} AS toks
           FROM documents),
         d AS (SELECT doc_id, array_to_string(
             list_transform(range(1, len(toks) + 1),
               i -> CASE WHEN i % 7 = 0 THEN toks[i] || '.'
                    ELSE toks[i] END), ' ') AS txt
           FROM t),
         r AS (SELECT doc_id,
             list_filter(list_transform(
               regexp_extract_all(txt, '[^.!?]+(?:[.!?]+|$$)'),
               x -> trim(x)), x -> x <> '') AS sents,
             list_filter(string_split_regex(trim(txt), '\\s+'),
               x -> x <> '') AS ws
           FROM d),
         c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS nw,
             CAST(len(sents) AS BIGINT) AS ns,
             -- COALESCE only the empty-list case (list_sum([]) is NULL in
             -- DuckDB, 0 in Spark's aggregate); a NULL text must stay NULL
             -- on both sides
             CAST(CASE WHEN ws IS NOT NULL THEN
               COALESCE(list_sum(list_transform(ws,
                 w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0)
               END AS BIGINT) AS ny
           FROM r)
         SELECT doc_id, nw AS n_words, ns AS n_sents, ny AS n_syllables,
           CASE WHEN nw > 0 AND ns > 0 THEN
             FLOOR((0.39e0 * nw / ns + 11.8e0 * ny / nw - 15.59e0) * 100
               + 0.5) / 100
           END AS fk_grade
         FROM c""",

    "q228_lag_correlation" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS nv,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
           FROM events GROUP BY 1),
         s AS (SELECT day - DATE '1970-01-01' AS t, nv, np FROM d),
         lg AS (SELECT unnest(range(0, 4)) AS lag),
         p AS (SELECT lg.lag, a.nv AS x, b.np AS y
           FROM lg CROSS JOIN s a JOIN s b ON b.t = a.t + lg.lag),
         m AS (SELECT lag, COUNT(*) AS n_pairs,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
           FROM p GROUP BY 1),
         f AS (SELECT lag, n_pairs,
             n_pairs * sxy - sx * sy AS cov,
             n_pairs * sxx - sx * sx AS vx,
             n_pairs * syy - sy * sy AS vy
           FROM m)
         SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
           CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END
             AS INT) AS cov_sign,
           CASE WHEN n_pairs >= 2 AND vx > 0 AND vy > 0 THEN
             CAST((2 * cov * cov * 1000000 + vx * vy)
               // (2 * vx * vy) AS BIGINT) / 1000000.0
           END AS r2
         FROM f""",

    "q229_ab_test" ->
      """WITH u AS (SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
           FROM events GROUP BY 1),
         c4 AS (SELECT
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
               AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)
               AS BIGINT) AS conv_b
           FROM u),
         k AS (SELECT *, n_a + n_b AS n, conv_a + conv_b AS c,
             CAST(conv_a AS HUGEINT) * n_b - CAST(conv_b AS HUGEINT) * n_a
               AS num
           FROM c4),
         k2 AS (SELECT *, CAST(n_a AS HUGEINT) * n_b * c * (n - c) AS den,
             (n_a > 0 AND n_b > 0 AND c > 0 AND c < n) AS ok
           FROM k)
         SELECT n_a, conv_a, n_b, conv_b,
           CASE WHEN n_a > 0 THEN
             CAST((2 * conv_a * 1000000 + n_a) // (2 * n_a) AS BIGINT)
               / 1000000.0 END AS rate_a,
           CASE WHEN n_b > 0 THEN
             CAST((2 * conv_b * 1000000 + n_b) // (2 * n_b) AS BIGINT)
               / 1000000.0 END AS rate_b,
           CASE WHEN ok THEN
             CAST((2 * num * num * n * 1000000 + den) // (2 * den)
               AS BIGINT) / 1000000.0 END AS z2,
           CASE WHEN ok THEN CAST(CASE WHEN num * num * n * 1000000
               > den * 3841459 THEN 1 ELSE 0 END AS INT)
           END AS significant
         FROM k2""",

    "q230_markov_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events),
         tr AS (SELECT prev AS prev_type, event_type AS next_type,
             COUNT(*) AS n_trans
           FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
         tt AS (SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS tot
           FROM tr GROUP BY 1)
         SELECT prev_type, next_type, CAST(n_trans AS BIGINT) AS n_trans,
           CAST((2 * n_trans * 1000000 + tot) // (2 * tot) AS BIGINT)
             / 1000000.0 AS p
         FROM tr JOIN tt USING (prev_type)""",

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
         FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hr = h.hr""",

    "q175_snapshot_diff" ->
      """WITH o AS (
           SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             o_orderpriority AS priority, o_orderdate
           FROM orders),
         a AS (SELECT o_orderkey, o_orderstatus, price, priority
               FROM o WHERE o_orderdate < TIMESTAMP '1997-01-01'),
         b AS (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 0 THEN price + 1 ELSE price END AS price,
                 CASE WHEN o_orderkey % 11 = 0 THEN '9-MUTATED' ELSE priority END AS priority
               FROM o WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
         j AS (
           SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS k,
             a.o_orderkey IS NOT NULL AS in_old,
             b.o_orderkey IS NOT NULL AS in_new,
             COALESCE(ARRAY_TO_STRING(list_filter([
               CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus THEN 'o_orderstatus' END,
               CASE WHEN a.price IS DISTINCT FROM b.price THEN 'price' END,
               CASE WHEN a.priority IS DISTINCT FROM b.priority THEN 'priority' END],
               x -> x IS NOT NULL), ','), '') AS diff_cols
           FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
         SELECT CASE WHEN NOT in_old THEN 'added'
                     WHEN NOT in_new THEN 'removed'
                     WHEN diff_cols <> '' THEN 'changed'
                     ELSE 'unchanged' END AS change_type,
           CASE WHEN in_old AND in_new THEN diff_cols ELSE '' END AS changed_cols,
           COUNT(*) AS n, MIN(k) AS min_key, MAX(k) AS max_key
         FROM j GROUP BY 1, 2""",

    "q176_column_profile" ->
      """WITH o AS (
           SELECT o_orderstatus, NULLIF(o_orderpriority, '1-URGENT') AS priority_nullable,
             o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
           FROM orders)
         SELECT 'o_orderstatus' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderstatus) AS n_nulls,
           COUNT(DISTINCT o_orderstatus) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_value
         FROM o
         UNION ALL
         SELECT 'priority_nullable', COUNT(*), COUNT(*) - COUNT(priority_nullable),
           COUNT(DISTINCT priority_nullable),
           CAST(MIN(priority_nullable) AS VARCHAR), CAST(MAX(priority_nullable) AS VARCHAR)
         FROM o
         UNION ALL
         SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
         FROM o
         UNION ALL
         SELECT 'price', COUNT(*), COUNT(*) - COUNT(price),
           COUNT(DISTINCT price),
           CAST(MIN(price) AS VARCHAR), CAST(MAX(price) AS VARCHAR)
         FROM o""",

    "q177_countmin" ->
      s"""WITH t AS (SELECT UNNEST(${AnalyticsQueries.toksSql}) AS w FROM documents),
         hx AS (SELECT w, ${AnalyticsQueries.polyHashSql("w")} AS h FROM t),
         dd AS $cmDdSql,
         regs AS (
           SELECT dd.d AS d, ((hx.h * dd.m + dd.d) % 1000000007) % 512 AS idx,
             COUNT(*) AS cnt
           FROM hx CROSS JOIN dd GROUP BY 1, 2),
         exact AS (SELECT w, MIN(h) AS h, COUNT(*) AS exact_n FROM hx GROUP BY w),
         probes AS (SELECT * FROM exact ORDER BY exact_n DESC, w LIMIT 10)
         SELECT p.w AS token, p.exact_n, MIN(COALESCE(r.cnt, 0)) AS cm_est
         FROM probes p CROSS JOIN dd
         LEFT JOIN regs r ON r.d = dd.d
           AND r.idx = ((p.h * dd.m + dd.d) % 1000000007) % 512
         GROUP BY 1, 2""",

    "q179_hll_registers" ->
      s"""WITH t AS (SELECT lang, UNNEST(${AnalyticsQueries.toksSql}) AS w FROM documents),
         h AS (SELECT lang,
             CAST(CONCAT('0x', SUBSTRING(md5(w), 1, 15)) AS BIGINT) AS h
           FROM t),
         r AS (SELECT lang, h % 64 AS bucket, h // 64 AS rem FROM h)
         SELECT lang, bucket,
           CAST(MAX(CASE WHEN rem > 0 THEN 54 - LENGTH(bin(rem)) + 1
                         ELSE 55 END) AS INT) AS rho_max
         FROM r GROUP BY 1, 2""",

    "q178_triangle_count" ->
      s"""WITH $linkEdgeCtesSql,
         c AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
               FROM e WHERE src <> dst),
         deg AS (SELECT x, COUNT(*) AS dg FROM
             (SELECT u AS x FROM c UNION ALL SELECT v FROM c) GROUP BY x),
         o AS (SELECT
             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND c.u < c.v)
                  THEN c.u ELSE c.v END AS s,
             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND c.u < c.v)
                  THEN c.v ELSE c.u END AS t,
             CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND c.u < c.v)
                  THEN dv.dg ELSE du.dg END AS td
           FROM c JOIN deg du ON c.u = du.x JOIN deg dv ON c.v = dv.x),
         w AS (SELECT o1.s, o1.t AS t1, o2.t AS t2
           FROM o o1 JOIN o o2 ON o1.s = o2.s
           WHERE o1.td < o2.td OR (o1.td = o2.td AND o1.t < o2.t)),
         tri AS (SELECT s, t1, t2 FROM w
           WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.t1 AND o.t = w.t2)),
         pv AS (SELECT vertex, COUNT(*) AS n_tri FROM
             (SELECT s AS vertex FROM tri
              UNION ALL SELECT t1 FROM tri
              UNION ALL SELECT t2 FROM tri) GROUP BY vertex)
         SELECT n_tri, COUNT(*) AS n_vertices FROM pv GROUP BY n_tri""",

    "q180_sentence_chunks" ->
      s"""WITH d0 AS (SELECT doc_id, ${AnalyticsQueries.toksSql} AS toks
           FROM documents),
         d AS (SELECT doc_id, array_to_string(
             list_transform(range(1, len(toks) + 1),
               i -> toks[i] || CASE WHEN i % 7 = 0 THEN '.' ELSE '' END),
             ' ') AS text
           FROM d0),
         t AS (SELECT doc_id,
           list_filter(list_transform(
             regexp_extract_all(text, '[^.!?]+(?:[.!?]+|$$)'), x -> trim(x)),
             x -> x <> '') AS sents
         FROM d),
         c AS (SELECT doc_id, list_transform(sents,
             x -> [[CAST(1 AS BIGINT),
                    CAST(len(list_filter(string_split_regex(x, '\\s+'),
                      y -> y <> '')) AS BIGINT)]]) AS elems
           FROM t),
         f AS (SELECT doc_id,
             list_reduce(list_prepend(CAST([] AS BIGINT[][]), elems),
               (a, x) -> CASE
                 WHEN len(a) = 0 THEN x
                 WHEN a[-1][2] + x[1][2] > 20 THEN list_concat(a, x)
                 ELSE list_concat(a[1:len(a)-1],
                   [[a[-1][1] + 1, a[-1][2] + x[1][2]]]) END) AS chunks
           FROM c)
         SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
           chunks[u.i][1] AS n_sentences, chunks[u.i][2] AS n_tokens
         FROM f, unnest(range(1, len(chunks) + 1)) AS u(i)""",

    // direct global registers — equal to the engine's per-lang merge iff
    // the merge law holds
    "q181_hll_merge" ->
      s"""WITH t AS (SELECT UNNEST(${AnalyticsQueries.toksSql}) AS w FROM documents),
         h AS (SELECT CAST(CONCAT('0x', SUBSTRING(md5(w), 1, 15)) AS BIGINT) AS h
           FROM t),
         r AS (SELECT h % 64 AS bucket, h // 64 AS rem FROM h)
         SELECT bucket,
           CAST(MAX(CASE WHEN rem > 0 THEN 54 - LENGTH(bin(rem)) + 1
                         ELSE 55 END) AS INT) AS rho_max
         FROM r GROUP BY 1""",

    "q182_content_digest" ->
      """WITH o AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS c1,
           CAST(o_custkey AS VARCHAR) AS c2,
           o_orderstatus AS c3,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS c4,
           NULLIF(o_orderpriority, '1-URGENT') AS c5,
           STRFTIME(o_orderdate, '%Y-%m-%d %H:%M:%S') AS c6
         FROM orders),
         h AS (SELECT CAST(CONCAT('0x', SUBSTRING(md5(
             COALESCE(c1, chr(2) || '<null>') || chr(1) ||
             COALESCE(c2, chr(2) || '<null>') || chr(1) ||
             COALESCE(c3, chr(2) || '<null>') || chr(1) ||
             COALESCE(c4, chr(2) || '<null>') || chr(1) ||
             COALESCE(c5, chr(2) || '<null>') || chr(1) ||
             COALESCE(c6, chr(2) || '<null>')), 1, 15)) AS BIGINT) AS h
           FROM o)
         SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(h AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS digest
         FROM h""",

    "q183_interval_overlap" ->
      """WITH iv AS (SELECT event_id, user_id, EPOCH_US(ts) AS s,
             EPOCH_US(ts) + (60 + event_id % 240) * 1000000 AS e
           FROM events),
         l AS (SELECT * FROM iv WHERE event_id % 2 = 0),
         r AS (SELECT * FROM iv WHERE event_id % 2 = 1),
         p AS (SELECT l.user_id, LEAST(l.e, r.e) - GREATEST(l.s, r.s) AS ov
           FROM l JOIN r ON l.user_id = r.user_id
             AND l.s < r.e AND r.s < l.e)
         SELECT user_id, COUNT(*) AS n_pairs,
           CAST(SUM(ov) AS BIGINT) AS overlap_us_sum
         FROM p GROUP BY user_id""",

    "q184_histogram" ->
      """WITH x AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
           FROM orders),
         b AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM x)
         SELECT ((x - lo) * 20) // (hi - lo + 1) AS bin,
           MIN(x) AS bin_lo, COUNT(*) AS n
         FROM x, b GROUP BY 1""",

    "q185_top_terms" ->
      s"""WITH t AS (SELECT doc_id, lang, UNNEST(${AnalyticsQueries.toksSql}) AS w
           FROM documents),
         tfx AS (SELECT lang, w, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         dfs AS (SELECT term, COUNT(*) AS df FROM
             (SELECT DISTINCT doc_id, w AS term FROM t) GROUP BY term),
         nn AS (SELECT COUNT(*) AS n FROM documents),
         ${graft.functions.Log2Fixed.lutCteSql},
         ${CurationQueries.log2fpStages("dfs", "term", "df", "lgdf", "df")},
         ${CurationQueries.log2fpStages("nn", "n", "n", "lgn", "n")},
         scored AS (SELECT tfx.lang, tfx.w AS term, tfx.tf, dfs.df,
             (nl.lgn - dfl.lgdf) * tfx.tf AS score_fp
           FROM tfx JOIN dfs ON tfx.w = dfs.term
             JOIN dfl ON dfl.term = tfx.w CROSS JOIN nl)
         SELECT lang, term, tf, df, score_fp,
           CAST(rnk AS INT) AS rnk
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY score_fp DESC, term) AS rnk FROM scored)
         WHERE rnk <= 5""",

    "q186_moment_stats" ->
      """WITH e AS (SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
         FROM events)
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS VARCHAR) AS sum_x,
           CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS sum_x2,
           CAST(SUM(CAST(y AS HUGEINT)) AS VARCHAR) AS sum_y,
           CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS sum_xy
         FROM e GROUP BY event_type""",

    "q187_quantile_bins" ->
      """WITH x AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
           FROM orders),
         vc AS (SELECT v, COUNT(*) AS cnt FROM x GROUP BY v),
         nn AS (SELECT COUNT(*) AS n FROM x),
         c AS (SELECT v, cnt, COALESCE(SUM(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM vc)
         SELECT CAST((cb * 20) // n AS BIGINT) AS bin,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi
         FROM c, nn GROUP BY 1""",

    "q188_sequence_match" ->
      """WITH s AS (SELECT user_id,
           STRING_AGG(SUBSTRING(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
         FROM events GROUP BY user_id),
         f AS (SELECT
             CAST(CASE WHEN regexp_matches(seq, 's.*p') THEN 1 ELSE 0 END AS INT) AS converted,
             CAST(CASE WHEN regexp_matches(seq, 'ee') THEN 1 ELSE 0 END AS INT) AS err_burst,
             CAST((LENGTH(seq) - LENGTH(REPLACE(seq, 'vp', ''))) / 2 AS BIGINT) AS n_vp
           FROM s)
         SELECT converted, err_burst, COUNT(*) AS n_users,
           CAST(SUM(n_vp) AS BIGINT) AS sum_vp
         FROM f GROUP BY 1, 2""",

    "q189_label_prop" ->
      s"""WITH $linkEdgeCtesSql,
         c AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
               FROM e WHERE src <> dst),
         bi AS (SELECT u AS n, v AS nb FROM c UNION ALL SELECT v, u FROM c),
         l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
         ${(1 to 3).map(lpaRoundSql).mkString(",\n         ")}
         SELECT community_size, COUNT(*) AS n_communities FROM
           (SELECT label, COUNT(*) AS community_size FROM l3 GROUP BY label)
         GROUP BY 1""",

    "q190_ewma" ->
      """WITH e AS (SELECT user_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
           ts, event_id
         FROM events),
         g AS (SELECT user_id, COUNT(*) AS n,
             list(x * 1048576 ORDER BY ts, event_id) AS xs
           FROM e GROUP BY user_id)
         SELECT user_id, CAST(n AS BIGINT) AS n,
           CAST(list_reduce(xs, (a, x) -> (x + 3 * a) // 4) AS BIGINT) AS ewma_fp
         FROM g""",

    // The Holt recursion replayed as a recursive CTE over per-user event
    // ranks — one iteration per series position, state = (level, trend).
    // NOT a list_reduce: DuckDB 1.0 evaluates a multi-field struct
    // accumulator's fields sequentially WITH IN-PLACE ALIASING (the
    // second field's a.l reads the first field's fresh output — verified
    // with debug fields), so any struct-state lambda fold where a later
    // field reads an earlier-overwritten one silently diverges. `//`
    // truncates toward zero, matching holtFixed's `%` idiom and a Scala
    // reference fold.
    "q254_holt" ->
      """WITH RECURSIVE e AS (SELECT user_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS i,
           COUNT(*) OVER (PARTITION BY user_id) AS n
         FROM events),
         st AS (
           SELECT user_id, n, CAST(1 AS BIGINT) AS i, x * 1048576 AS l,
             CAST(0 AS BIGINT) AS b
           FROM e WHERE i = 1
           UNION ALL
           SELECT st.user_id, st.n, st.i + 1,
             (e.x * 1048576 + 3 * (st.l + st.b)) // 4,
             (((e.x * 1048576 + 3 * (st.l + st.b)) // 4 - st.l)
               + 4 * st.b) // 5
           FROM st JOIN e ON e.user_id = st.user_id AND e.i = st.i + 1
         )
         SELECT user_id, CAST(n AS BIGINT) AS n, l AS level_fp,
           b AS trend_fp, l + b AS forecast_fp
         FROM st WHERE i = n""",

    // q254's recursive-CTE discipline with the seasonal LIST carried in
    // the state row (list slicing rebuilds the updated slot — plain
    // column arithmetic, no lambda-fold aliasing); l' is textually
    // recomputed in the trend and seasonal steps (SQL has no let)
    "q256_holt_winters" ->
      """WITH RECURSIVE e AS (SELECT user_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS i,
           COUNT(*) OVER (PARTITION BY user_id) AS n
         FROM events),
         st AS (
           SELECT user_id, n, CAST(1 AS BIGINT) AS i, x * 1048576 AS l,
             CAST(0 AS BIGINT) AS b,
             [CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
              CAST(0 AS BIGINT)] AS s
           FROM e WHERE i = 1
           UNION ALL
           SELECT st.user_id, st.n, st.i + 1,
             ((e.x * 1048576 - st.s[CAST(st.i % 4 + 1 AS INT)])
               + 3 * (st.l + st.b)) // 4,
             ((((e.x * 1048576 - st.s[CAST(st.i % 4 + 1 AS INT)])
               + 3 * (st.l + st.b)) // 4 - st.l) + 4 * st.b) // 5,
             st.s[1:CAST(st.i % 4 AS INT)]
               || [((e.x * 1048576
                     - (((e.x * 1048576 - st.s[CAST(st.i % 4 + 1 AS INT)])
                       + 3 * (st.l + st.b)) // 4))
                   + 2 * st.s[CAST(st.i % 4 + 1 AS INT)]) // 3]
               || st.s[CAST(st.i % 4 + 2 AS INT):4]
           FROM st JOIN e ON e.user_id = st.user_id AND e.i = st.i + 1
         )
         SELECT user_id, CAST(n AS BIGINT) AS n, l AS level_fp,
           b AS trend_fp, s[CAST(n % 4 + 1 AS INT)] AS season_fp,
           l + b + s[CAST(n % 4 + 1 AS INT)] AS forecast_fp
         FROM st WHERE i = n""",

    "q191_outliers" ->
      """WITH e AS (SELECT event_type,
           CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS x
         FROM events),
         st AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
             SUM(x * x) AS sx2
           FROM e GROUP BY event_type)
         SELECT e.event_type, CAST(MIN(st.n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN (e.x * st.n - st.sx) * (e.x * st.n - st.sx) >
             9 * (st.n * st.sx2 - st.sx * st.sx) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
         FROM e JOIN st USING (event_type)
         GROUP BY e.event_type""",

    "q197_clean_document" -> {
      import graft.functions.TextFunctions.{PyStripRegex, RefEditorRegex, RefNoisePatterns, RefPageNumRegex}
      def strip(e: String) = s"regexp_replace($e, '$PyStripRegex', '', 'g')"
      val sl = strip("line")
      val mdLinks = s"len(regexp_extract_all($sl, '\\[.*?\\]\\(.*?\\)'))"
      val noisySql = (Seq(s"$sl = ''") ++
        RefNoisePatterns.map(p => s"regexp_matches($sl, '$p')") :+
        s"($mdLinks > 2 AND length($sl) / ($mdLinks + 1) < 30)")
        .mkString("(", " OR ", ")")
      s"""WITH t AS (SELECT doc_id, ${AnalyticsQueries.toksSql} AS toks FROM documents),
         ln AS (SELECT doc_id, u.i AS i,
             array_to_string(toks[2*u.i+1:2*u.i+2], ' ') AS line0
           FROM t, unnest(range(0, GREATEST(1, (len(toks)+1)//2))) AS u(i)),
         dec AS (SELECT doc_id, i,
             CASE WHEN i % 6 = 2 THEN '- ' || i || ' -'
                  WHEN i % 10 = 0 THEN '页眉 HEADER-X'
                  WHEN i % 7 = 3 THEN '分享到 ' || line0
                  WHEN i % 9 = 4 THEN '[a](u1) [b](u2) [c](u3)'
                  WHEN i % 13 = 6 THEN line0 || ' 版权所有'
                  WHEN i % 11 = 5 THEN line0 || ' (责任编辑：张三)'
                  ELSE line0 END AS line
           FROM ln),
         nl AS (SELECT doc_id, COUNT(*) AS n FROM dec GROUP BY doc_id),
         cnt AS (SELECT doc_id, ${strip("line")} AS s, COUNT(*) AS c FROM dec
           WHERE ${strip("line")} <> '' AND length(${strip("line")}) < 100 GROUP BY 1, 2),
         rep AS (SELECT cnt.doc_id, cnt.s FROM cnt JOIN nl USING (doc_id)
           WHERE cnt.c >= 3 AND nl.n >= 20),
         f1 AS (SELECT dec.doc_id, dec.i, dec.line FROM dec
           LEFT JOIN rep ON dec.doc_id = rep.doc_id AND ${strip("dec.line")} = rep.s
           WHERE rep.s IS NULL),
         f2 AS (SELECT * FROM f1 WHERE
           NOT regexp_matches(${strip("line")}, '$RefPageNumRegex')
           AND NOT $noisySql),
         f3 AS (SELECT doc_id, i,
             ${strip(s"regexp_replace(line, '$RefEditorRegex', '', 'g')")} AS line
           FROM f2),
         f4 AS (SELECT * FROM f3 WHERE line <> ''),
         agg AS (SELECT t.doc_id, COALESCE(x.txt, '') AS txt FROM t
           LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
                      FROM f4 GROUP BY doc_id) x USING (doc_id)),
         fin AS (SELECT doc_id,
             CASE WHEN length(txt) > 150 THEN substring(txt, 1, 150) ||
               chr(10) || chr(10) || '...[文档内容过长，已截断至 150 字符]'
             ELSE txt END AS text_clean
           FROM agg)
         SELECT doc_id, text_clean, length(text_clean) AS n_chars FROM fin"""
    },

    "q198_cusum" ->
      """WITH e AS (SELECT user_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
           ts, event_id
         FROM events),
         g AS (SELECT user_id, COUNT(*) AS n,
             list([CAST(0 AS BIGINT), x] ORDER BY ts, event_id) AS xs
           FROM e GROUP BY user_id),
         f AS (SELECT user_id, n,
             list_reduce(list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)], xs),
               (a, e) -> CASE
                 WHEN GREATEST(0, a[2] + e[2] - 6000) > 30000
                   THEN [a[1] + 1, CAST(0 AS BIGINT)]
                 ELSE [a[1], GREATEST(0, a[2] + e[2] - 6000)] END) AS st
           FROM g)
         SELECT user_id, CAST(n AS BIGINT) AS n,
           st[1] AS n_alarms, st[2] AS final_s
         FROM f""",

    "q289_eb_shrinkage" ->
      """WITH g AS (SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS s
           FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         r AS (SELECT user_id, n, s,
             (2 * CAST(s AS HUGEINT) * 1000000 + n)
               // (2 * CAST(n AS HUGEINT)) AS rm
           FROM g),
         p AS (SELECT COUNT(*) AS gg, CAST(SUM(rm) AS HUGEINT) AS sr,
             CAST(SUM(CAST(rm AS HUGEINT) * rm) AS HUGEINT) AS sr2
           FROM r),
         p2 AS (SELECT gg, sr, sr2,
             (2 * sr * 1000000 + CAST(gg AS HUGEINT) * 1000000)
               // (2 * CAST(gg AS HUGEINT) * 1000000) AS mu,
             CASE WHEN gg > 1 THEN
               (gg * sr2 - sr * sr)
                 // (CAST(gg AS HUGEINT) * (gg - 1)) END AS v
           FROM p),
         p3 AS (SELECT *,
             CASE WHEN v > 0
               THEN (mu * (1000000 - mu)) // v - 1 END AS k
           FROM p2)
         SELECT user_id, n, s,
           CAST(rm AS BIGINT) / 1000000.0 AS rate,
           CASE WHEN gg < 2 THEN NULL
                WHEN v <= 0 THEN CAST(mu AS BIGINT) / 1000000.0
                WHEN k <= 0 THEN CAST(rm AS BIGINT) / 1000000.0
                ELSE CAST((2 * (CAST(s AS HUGEINT) * 1000000 + k * mu)
                    * 1000000 + 1000000 * (CAST(n AS HUGEINT) + k))
                  // (2 * 1000000 * (CAST(n AS HUGEINT) + k)) AS BIGINT)
                  / 1000000.0
           END AS shrunk_rate,
           CASE WHEN gg >= 2
             THEN CAST(mu AS BIGINT) / 1000000.0 END AS prior_mean,
           CASE WHEN gg >= 2 AND v > 0 AND k > 0
             THEN CAST(k AS BIGINT) END AS prior_strength
         FROM r CROSS JOIN p3""",

    "q288_sprt" -> {
      val (l1, l0, bound) = Journey.sprtConstants(0.20, 0.30, 0.05, 0.05)
      s"""WITH e AS (SELECT event_type, ts, event_id,
           CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >=
             CASE WHEN event_type IN ('purchase', 'signup')
               THEN 5000 ELSE 9000 END
           THEN 1 ELSE 0 END AS s
         FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
         w AS (SELECT event_type, s,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS rn,
             SUM(CASE WHEN s = 1 THEN $l1 ELSE $l0 END)
               OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
           FROM e),
         r AS (SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(s) AS BIGINT) AS n_success,
             MIN(CASE WHEN ABS(llr) >= $bound THEN rn END)
               AS n_at_decision,
             arg_max(llr, rn) AS llr_last
           FROM w GROUP BY 1),
         d AS (SELECT r.*, w.llr AS dllr
           FROM r LEFT JOIN w ON w.event_type = r.event_type
             AND w.rn = r.n_at_decision)
         SELECT event_type, n_events, n_success,
           CASE WHEN dllr >= $bound THEN 'accept_h1'
                WHEN dllr <= -$bound THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           n_at_decision,
           CAST(dllr AS DOUBLE) / 1048576 AS llr_at_decision_bits,
           CAST(llr_last AS DOUBLE) / 1048576 AS llr_final_bits
         FROM d"""
    },

    "q200_life_table" ->
      """WITH spans AS (SELECT user_id,
           DATE_DIFF('day', CAST(MIN(ts) AS DATE),
             CAST(COALESCE(
               MIN(CASE WHEN event_type = 'purchase' AND value >= 150 THEN ts END),
               MAX(ts)) AS DATE)) AS dur,
           MAX(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS event
         FROM events GROUP BY user_id),
         byd AS (SELECT dur, CAST(SUM(event) AS BIGINT) AS n_event,
             CAST(SUM(1 - event) AS BIGINT) AS n_censored,
             COUNT(*) AS n_at
           FROM spans GROUP BY dur),
         risk AS (SELECT a.dur, CAST(SUM(b.n_at) AS BIGINT) AS n_risk
           FROM byd a JOIN byd b ON b.dur >= a.dur GROUP BY a.dur)
         SELECT byd.dur, risk.n_risk, byd.n_event, byd.n_censored
         FROM byd JOIN risk USING (dur)""",

    "q199_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS c_ts, event_id AS c_id
           FROM events WHERE event_type = 'click'),
         j AS (SELECT p.p_id, c.c_ts,
             ROW_NUMBER() OVER (PARTITION BY p.p_id
               ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
           FROM p JOIN c ON c.user_id = p.user_id AND c.c_ts <= p.p_ts),
         a AS (SELECT p.p_id, p.cents, p.user_id,
             CAST(CASE WHEN j.c_ts IS NOT NULL AND
               EPOCH_US(p.p_ts) - EPOCH_US(j.c_ts) <= 604800000000
               THEN 1 ELSE 0 END AS INT) AS attributed
           FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (p_id))
         SELECT attributed, COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           COUNT(DISTINCT user_id) AS n_users
         FROM a GROUP BY attributed""",

    "q195_geohash" ->
      s"""WITH $geoPointsSql,
         c AS (SELECT event_id,
             LEAST(((lat_m + 90000) * 32768) // 180000, 32767) AS latc,
             LEAST(((lng_m + 180000) * 32768) // 360000, 32767) AS lngc
           FROM pts),
         g AS (SELECT event_id,
             (${spreadSql("latc")} | (${spreadSql("lngc")} << 1)) AS gh
           FROM c),
         s AS (SELECT event_id,
             lpad(translate(to_base(gh, 32),
               '${Geohash.Base32Std}',
               '${Geohash.Alphabet}'), 6, '0') AS ghs
           FROM g)
         SELECT substr(ghs, 1, 2) AS prefix, COUNT(*) AS n,
           MIN(ghs) AS gh_min, MAX(ghs) AS gh_max
         FROM s GROUP BY 1""",

    "q196_geo_pairs" ->
      s"""WITH $geoPointsSql,
         p AS (SELECT event_id AS id, lat_m, lng_m,
             LEAST(((lat_m + 90000) * 128) // 180000, 127) AS latc,
             LEAST(((lng_m + 180000) * 128) // 360000, 127) AS lngc
           FROM pts WHERE event_id < 3000),
         pr AS (SELECT a.id AS l_id,
             (a.lat_m - b.lat_m) * (a.lat_m - b.lat_m) +
               (a.lng_m - b.lng_m) * (a.lng_m - b.lng_m) AS d2
           FROM p a JOIN p b ON a.id < b.id
             AND abs(a.latc - b.latc) <= 1 AND abs(a.lngc - b.lngc) <= 1)
         SELECT COUNT(*) AS n_pairs, CAST(SUM(d2) AS BIGINT) AS sum_d2,
           COUNT(DISTINCT l_id) AS n_left
         FROM pr WHERE d2 <= 1440000""",

    "q193_copurchase" ->
      s"""WITH $basketPairsCtesSql,
         sym AS (SELECT p1 AS item, p2 AS partner, c_ab FROM pairs
                 UNION ALL SELECT p2, p1, c_ab FROM pairs)
         SELECT item, partner, c_ab, CAST(rnk AS INT) AS rnk FROM
           (SELECT *, ROW_NUMBER() OVER (PARTITION BY item
              ORDER BY c_ab DESC, partner) AS rnk FROM sym)
         WHERE rnk <= 3""",

    "q194_basket_lift" ->
      s"""WITH $basketPairsCtesSql,
         nn AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li),
         ic AS (SELECT pk, COUNT(*) AS c_item FROM li GROUP BY pk),
         sp AS (SELECT * FROM pairs WHERE c_ab >= 3)
         SELECT p1, p2, c_ab, ia.c_item AS c_a, ib.c_item AS c_b,
           CAST((c_ab * n_orders * 1000000) // (ia.c_item * ib.c_item) AS BIGINT)
             AS lift_fp
         FROM sp JOIN ic ia ON sp.p1 = ia.pk
           JOIN ic ib ON sp.p2 = ib.pk CROSS JOIN nn
         ORDER BY lift_fp DESC, p1, p2 LIMIT 20""",

    // direct union registers — equal to the engine's per-source merge
    // iff the sum-merge law holds
    "q192_cms_merge" ->
      s"""WITH t AS (SELECT UNNEST(${AnalyticsQueries.toksSql}) AS w FROM documents),
         hx AS (SELECT w, ${AnalyticsQueries.polyHashSql("w")} AS h FROM t),
         dd AS $cmDdSql
         SELECT dd.d AS d, ((hx.h * dd.m + dd.d) % 1000000007) % 512 AS idx,
           COUNT(*) AS cnt
         FROM hx CROSS JOIN dd GROUP BY 1, 2""",

    "q292_wilson_rates" ->
      """WITH g AS (SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CASE WHEN CAST(value AS DECIMAL(18,2)) * 100 >= 5000
               THEN 1 ELSE 0 END) AS BIGINT) AS s
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         w0 AS (SELECT event_type, n, s,
             CAST(3841459 AS HUGEINT) *
               ((4000000 * CAST(s AS HUGEINT) * (n - s)) // n + 3841459)
               AS t
           FROM g),
         w1 AS (SELECT *, CAST(FLOOR(SQRT(CAST(t AS DOUBLE))) AS BIGINT)
             AS s0 FROM w0),
         w2 AS (SELECT event_type, n, s, t,
             CASE WHEN CAST(s0 + 2 AS HUGEINT) * (s0 + 2) <= t THEN s0 + 2
                  WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= t THEN s0 + 1
                  WHEN CAST(s0 AS HUGEINT) * s0 <= t THEN s0
                  WHEN CAST(s0 - 1 AS HUGEINT) * (s0 - 1) <= t THEN s0 - 1
                  ELSE s0 - 2 END AS rt
           FROM w1),
         w3 AS (SELECT event_type, n, s, rt,
             (2000000 * CAST(s AS HUGEINT) + 3841459 - rt) * 1000000
               AS lbnum,
             (2000000 * CAST(s AS HUGEINT) + 3841459 + rt) * 1000000
               AS ubnum,
             (1000000 * CAST(n AS HUGEINT) + 3841459) * 2 AS den
           FROM w2)
         SELECT event_type, n, s,
           CAST((2 * CAST(s AS HUGEINT) * 1000000 + n) // (2 * n)
             AS BIGINT) / 1000000.0 AS rate,
           CAST((2 * lbnum + den) // (2 * den) AS BIGINT) / 1000000.0
             AS wilson_lb,
           CAST((2 * ubnum + den) // (2 * den) AS BIGINT) / 1000000.0
             AS wilson_ub
         FROM w3""",

    "q293_cuped" ->
      """WITH e AS (SELECT user_id,
             CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         m AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e),
         u AS (SELECT user_id,
             SUM(CASE WHEN day < mid THEN cents ELSE 0 END) AS x,
             SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) AS y
           FROM e, m GROUP BY 1),
         a AS (SELECT (user_id // 20) % 2 AS arm, x, y FROM u),
         p AS (SELECT COUNT(*) AS nn, CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
           FROM a),
         ar AS (SELECT arm, COUNT(*) AS n, CAST(SUM(x) AS HUGEINT) AS sxa,
             CAST(SUM(y) AS HUGEINT) AS sya
           FROM a GROUP BY 1),
         st AS (SELECT arm, n, sxa, sya, nn, sx,
             nn * sxx - sx * sx AS vxx, nn * sxy - sx * sy AS vxy,
             nn * syy - sy * sy AS vyy
           FROM ar, p),
         th AS (SELECT *, CASE WHEN vxx > 0 THEN
               CAST((CASE WHEN vxy < 0 THEN -1 ELSE 1 END) *
                 ((2 * ABS(vxy) * 1000000 + vxx) // (2 * vxx)) AS BIGINT)
             END AS thm,
             CASE WHEN vyy > 0 THEN
               CAST((CASE WHEN vxy < 0 THEN -1 ELSE 1 END) *
                 ((2 * ABS(vxy) * 1000000 + vyy) // (2 * vyy)) AS BIGINT)
             END AS th2m
           FROM st),
         fin AS (SELECT arm, n, sxa, sya, nn, sx, vxx, vxy, vyy, thm,
             th2m,
             sya * nn * 1000000 - thm * (nn * sxa - sx * n) AS adjnum,
             CAST(n AS HUGEINT) * nn * 1000000 AS adjden
           FROM th)
         SELECT arm, n,
           CAST((CASE WHEN sxa < 0 THEN -1 ELSE 1 END) *
             ((2 * ABS(sxa) * 1000000 + n) // (2 * n)) AS BIGINT)
             / 1000000.0 AS mean_x,
           CAST((CASE WHEN sya < 0 THEN -1 ELSE 1 END) *
             ((2 * ABS(sya) * 1000000 + n) // (2 * n)) AS BIGINT)
             / 1000000.0 AS mean_y,
           CAST(thm AS BIGINT) / 1000000.0 AS theta,
           CASE WHEN thm IS NOT NULL THEN
               CAST((CASE WHEN adjnum < 0 THEN -1 ELSE 1 END) *
                 ((2 * ABS(adjnum) * 1000000 + adjden) // (2 * adjden))
                 AS BIGINT) / 1000000.0
             ELSE CAST((CASE WHEN sya < 0 THEN -1 ELSE 1 END) *
               ((2 * ABS(sya) * 1000000 + n) // (2 * n)) AS BIGINT)
               / 1000000.0 END AS mean_y_adj,
           CASE WHEN thm IS NOT NULL AND th2m IS NOT NULL THEN
               CAST((CAST(thm AS HUGEINT) * th2m -
                 ((CAST(thm AS HUGEINT) * th2m) % 1000000)) // 1000000
                 AS BIGINT) / 1000000.0
             END AS rho2
         FROM fin""",

    "q298_diff_in_diff" ->
      """WITH e AS (SELECT user_id,
             CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         md AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e),
         u AS (SELECT user_id, (user_id // 20) % 2 AS arm,
             CAST(SUM(CASE WHEN day < mid THEN cents ELSE 0 END)
               AS HUGEINT) AS pre,
             CAST(SUM(CASE WHEN day >= mid THEN cents ELSE 0 END)
               AS HUGEINT) AS post
           FROM e, md GROUP BY 1, 2),
         a AS (SELECT arm, COUNT(*) AS n, SUM(pre) AS sp,
             SUM(post) AS so
           FROM u GROUP BY 1),
         m AS (SELECT arm, n,
             CAST((CASE WHEN sp < 0 THEN -1 ELSE 1 END) *
               ((2 * ABS(sp) * 1000000 + n) // (2 * n)) AS BIGINT) AS mp,
             CAST((CASE WHEN so < 0 THEN -1 ELSE 1 END) *
               ((2 * ABS(so) * 1000000 + n) // (2 * n)) AS BIGINT) AS mo
           FROM a),
         p AS (SELECT
             MAX(CASE WHEN arm = 1 THEN n END) AS nt,
             MAX(CASE WHEN arm = 0 THEN n END) AS nc,
             MAX(CASE WHEN arm = 1 THEN mp END) AS mpt,
             MAX(CASE WHEN arm = 1 THEN mo END) AS mot,
             MAX(CASE WHEN arm = 0 THEN mp END) AS mpc,
             MAX(CASE WHEN arm = 0 THEN mo END) AS moc
           FROM m)
         SELECT COALESCE(nt, 0) AS n_t, COALESCE(nc, 0) AS n_c,
           mpt / 1000000.0 AS mean_pre_t,
           mot / 1000000.0 AS mean_post_t,
           mpc / 1000000.0 AS mean_pre_c,
           moc / 1000000.0 AS mean_post_c,
           ((mot - mpt) - (moc - mpc)) / 1000000.0 AS did
         FROM p""")
}
