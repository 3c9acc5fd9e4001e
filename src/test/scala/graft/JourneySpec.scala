package graft

import java.sql.Timestamp

import graft.operators.Journey
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JourneySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val stages = Seq("a", "b", "c")

  test("funnel: chained-min progression with strict ordering") {
    // u1 completes in order; u2 has b BEFORE a (must not count); u3 stops at b
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),
      (2L, ts("2024-01-01 09:00:00"), "b"),
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 12:00:00"), "c"), // c without b: no advance
      (3L, ts("2024-01-01 10:00:00"), "a"),
      (3L, ts("2024-01-01 10:30:00"), "b"),
      (4L, ts("2024-01-01 10:00:00"), "x") // never enters the funnel
    ).toDF("u", "t", "e")
    val d = Journey.funnel(evs, col("u"), col("t"), col("e"), stages, 86400L)
      .select("user_key", "depth").as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("funnel: window cap measured from the stage-1 anchor") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-03 12:00:00"), "c"), // outside 24h of anchor
      (2L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-02 09:00:00"), "b") // inside 24h
    ).toDF("u", "t", "e")
    val d = Journey.funnel(evs, col("u"), col("t"), col("e"), stages, 86400L)
      .select("user_key", "depth").as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 2, 2L -> 2))
  }

  test("funnel: null timestamps ignored, never anchor") {
    val evs = Seq(
      (1L, null.asInstanceOf[Timestamp], "a"), // must not anchor
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b")
    ).toDF("u", "t", "e")
    val d = Journey.funnel(evs, col("u"), col("t"), col("e"), stages, 86400L)
      .select("user_key", "depth", "anchor_us").as[(Long, Int, Long)].collect().toSeq
    assert(d == Seq((1L, 2, Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000)))
  }

  test("funnel: same-timestamp later stage does not advance (strict >)") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b")
    ).toDF("u", "t", "e")
    val d = Journey.funnel(evs, col("u"), col("t"), col("e"), stages, 86400L)
      .select("user_key", "depth").as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 1))
  }

  test("funnel: partition-independent (fold equals chained joins)") {
    val base = (1L to 400L).map { i =>
      (i % 40, ts(f"2024-01-${1 + (i % 25).toInt}%02d ${i % 24}%02d:${i % 60}%02d:00"),
        stages((i % 5 % 3).toInt))
    }.toDF("u", "t", "e")
    val a = Journey.funnel(base, col("u"), col("t"), col("e"), stages, 864000L)
      .orderBy("user_key").collect().toSeq
    val b = Journey.funnel(base.repartition(13), col("u"), col("t"), col("e"),
      stages, 864000L).orderBy("user_key").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("funnelReport: counts are cumulative-reach, pct vs stage 1") {
    val depths = Seq((1L, 3, 0L), (2L, 1, 0L), (3L, 2, 0L), (4L, 1, 0L))
      .toDF("user_key", "depth", "anchor_us")
    val r = Journey.funnelReport(depths, stages)
      .select("stage_no", "stage", "n_users", "pct_of_first")
      .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1, "a", 4L, 1.0), (2, "b", 2L, 0.5), (3, "c", 1L, 0.25)))
  }

  test("cohortRetention: offsets count whole weeks from first-event week") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday, cohort week 2024-01-01
      (1L, ts("2024-01-10 10:00:00")), // offset 1
      (1L, ts("2024-01-21 10:00:00")), // Sunday of week 2024-01-15 → offset 2
      (2L, ts("2024-01-10 10:00:00")) // cohort 2024-01-08, offset 0
    ).toDF("u", "t")
    val r = Journey.cohortRetention(evs, col("u"), col("t"))
      .select("cohort_week", "week_offset", "n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(r == Set(("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L),
      ("2024-01-01", 2, 1L), ("2024-01-08", 0, 1L)))
  }

  test("eventSequence: (ts, tiebreak) order, null ts dropped") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"), // same ts: tiebreak orders
      (1L, ts("2024-01-01 09:00:00"), 9L, "z"),
      (1L, null.asInstanceOf[Timestamp], 0L, "X"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "q")
    ).toDF("u", "t", "id", "sym")
    val r = Journey.eventSequence(evs, col("u"), col("t"), col("id"), col("sym"))
      .select("key", "seq", "n_events").as[(Long, String, Long)]
      .collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(r == Map(1L -> (("zab", 3L)), 2L -> (("q", 1L))))
  }

  test("ewmaFixed: fold matches the scalar recursion exactly") {
    val xs = Seq(400L, 100L, 700L, 0L, 250L)
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    val got = Journey.ewmaFixed(evs, col("u"), col("t"), col("id"), col("x"), 4)
      .select("ewma_fp", "n").as[(Long, Long)].head()
    val q = 1L << 20
    val expect = xs.tail.foldLeft(xs.head * q)((a, x) => (x * q + 3 * a) / 4)
    assert(got == ((expect, 5L)))
  }

  test("ewmaFixed: negative values — truncating division both engines") {
    // refunds drive the accumulator negative; Scala's `/` truncates,
    // matching the operator's `%`-based div and DuckDB's `//`
    val xs = Seq(-400L, 100L, -700L, 3L)
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    val got = Journey.ewmaFixed(evs, col("u"), col("t"), col("id"), col("x"), 4)
      .select("ewma_fp").as[Long].head()
    val q = 1L << 20
    val expect = xs.tail.foldLeft(xs.head * q)((a, x) => (x * q + 3 * a) / 4)
    assert(got == expect)
    assert(expect < 0) // the case actually exercises the negative path
  }

  test("ewmaFixed: partition-independent") {
    val evs = (1L to 2000L).map(i =>
      (i % 20, ts(f"2024-01-${1 + (i % 25)}%02d 10:00:00"), i, i % 777))
      .toDF("u", "t", "id", "x")
    val a = Journey.ewmaFixed(evs, col("u"), col("t"), col("id"), col("x"), 4)
      .collect().map(_.toSeq).toSet
    val b = Journey.ewmaFixed(evs.repartition(17), col("u"), col("t"),
      col("id"), col("x"), 4).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 20)
  }

  /** Scalar reference for [[Journey.holtFixed]]: level/trend recursion
    * with truncating division (Scala `/` == DuckDB `//`).
    */
  private def holtRef(xs: Seq[Long], da: Long, db: Long): (Long, Long) = {
    val q = 1L << 20
    xs.tail.foldLeft((xs.head * q, 0L)) { case ((l, b), x) =>
      val l1 = (x * q + (da - 1) * (l + b)) / da
      val b1 = ((l1 - l) + (db - 1) * b) / db
      (l1, b1)
    }
  }

  test("holtFixed: fold matches the scalar level+trend recursion exactly") {
    val xs = Seq(400L, 500L, 610L, 690L, 820L, 900L) // steady growth
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    val got = Journey.holtFixed(evs, col("u"), col("t"), col("id"),
        col("x"), da = 4, db = 5)
      .select("level_fp", "trend_fp", "forecast_fp", "n")
      .as[(Long, Long, Long, Long)].head()
    val (l, b) = holtRef(xs, 4, 5)
    assert(got == ((l, b, l + b, 6L)))
    assert(b > 0) // a growing series must carry positive trend
  }

  test("holtFixed: declining series — negative trend, truncating division") {
    val xs = Seq(900L, 700L, 450L, 300L, 90L)
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    val got = Journey.holtFixed(evs, col("u"), col("t"), col("id"),
        col("x"), da = 4, db = 5)
      .select("level_fp", "trend_fp").as[(Long, Long)].head()
    val (l, b) = holtRef(xs, 4, 5)
    assert(got == ((l, b)))
    assert(b < 0) // the negative-numerator division path is exercised
  }

  test("holtFixed: single event seeds (level = x*2^20, trend = 0)") {
    val evs = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 42L))
      .toDF("u", "t", "id", "x")
    val got = Journey.holtFixed(evs, col("u"), col("t"), col("id"),
        col("x"), da = 4, db = 5)
      .select("level_fp", "trend_fp", "n").as[(Long, Long, Long)].head()
    assert(got == ((42L << 20, 0L, 1L)))
  }

  test("holtFixed: partition-independent") {
    val evs = (1L to 2000L).map(i =>
      (i % 20, ts(f"2024-01-${1 + (i % 25)}%02d 10:00:00"), i,
        (i % 777) - 300))
      .toDF("u", "t", "id", "x")
    val a = Journey.holtFixed(evs, col("u"), col("t"), col("id"),
      col("x"), 4, 5).collect().map(_.toSeq).toSet
    val b = Journey.holtFixed(evs.repartition(17), col("u"), col("t"),
      col("id"), col("x"), 4, 5).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 20)
  }

  /** Scalar reference for [[Journey.holtWintersFixed]]. */
  private def hwRef(xs: Seq[Long], p: Int, da: Long, db: Long, dc: Long)
      : (Long, Long, Long) = {
    val q = 1L << 20
    var l = xs.head * q; var b = 0L
    val s = Array.fill(p)(0L)
    xs.tail.zipWithIndex.foreach { case (x, k) =>
      val j = (k + 1) % p // position t = k+2: slot (t-1) mod p
      val xq = x * q
      val l1 = ((xq - s(j)) + (da - 1) * (l + b)) / da
      val b1 = ((l1 - l) + (db - 1) * b) / db
      s(j) = ((xq - l1) + (dc - 1) * s(j)) / dc
      l = l1; b = b1
    }
    (l, b, s(xs.size % p))
  }

  test("holtWintersFixed: fold matches the scalar triple recursion exactly") {
    val rnd = new scala.util.Random(23)
    // trend + a planted period-4 additive pattern + noise
    val season = Seq(900L, -350L, 120L, -640L)
    val xs = (0 until 37).map(t =>
      2000L + 45L * t + season(t % 4) + rnd.nextInt(21) - 10)
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    val got = Journey.holtWintersFixed(evs, col("u"), col("t"), col("id"),
        col("x"), period = 4, da = 4, db = 5, dc = 3)
      .select("level_fp", "trend_fp", "season_fp", "forecast_fp", "n")
      .as[(Long, Long, Long, Long, Long)].head()
    val (l, b, sj) = hwRef(xs, 4, 4, 5, 3)
    assert(got == ((l, b, sj, l + b + sj, 37L)))
    assert(b > 0) // the planted trend shows in the trend component
  }

  test("holtWintersFixed: seasonal slots capture the planted pattern sign") {
    // long pure-seasonal series: slot estimates must take the sign of
    // the planted offsets (the zero-seed recursion converges toward them)
    val season = Seq(800L, -800L, 400L, -400L)
    val xs = (0 until 160).map(t => 5000L + season(t % 4))
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    // n = 160 -> next slot j = 0: planted +800 there
    val sj = Journey.holtWintersFixed(evs, col("u"), col("t"), col("id"),
        col("x"), period = 4, da = 4, db = 5, dc = 3)
      .select("season_fp").as[Long].head()
    assert(sj > (300L << 20),
      s"slot-0 seasonal should approach +800*2^20, got $sj")
  }

  test("holtWintersFixed: single event seeds (level, 0 trend, 0 season)") {
    val evs = Seq((1L, ts("2024-01-01 10:00:00"), 1L, 42L))
      .toDF("u", "t", "id", "x")
    val got = Journey.holtWintersFixed(evs, col("u"), col("t"), col("id"),
        col("x"), period = 4, da = 4, db = 5, dc = 3)
      .select("level_fp", "trend_fp", "season_fp").as[(Long, Long, Long)]
      .head()
    assert(got == ((42L << 20, 0L, 0L)))
  }

  test("holtWintersFixed: partition-independent") {
    val evs = (1L to 1500L).map(i =>
      (i % 10, ts(f"2024-01-${1 + (i % 25)}%02d 10:00:00"), i,
        (i % 555) - 200))
      .toDF("u", "t", "id", "x")
    val a = Journey.holtWintersFixed(evs, col("u"), col("t"), col("id"),
      col("x"), 4, 4, 5, 3).collect().map(_.toSeq).toSet
    val b = Journey.holtWintersFixed(evs.repartition(13), col("u"),
      col("t"), col("id"), col("x"), 4, 4, 5, 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 10)
  }

  test("cusum: accumulate-above-target, alarm-and-restart, scalar parity") {
    // target 10, threshold 25: xs drift the statistic up, alarm resets
    val xs = Seq(20L, 20L, 20L, 5L, 30L, 40L, 0L)
    val evs = xs.zipWithIndex.map { case (x, i) =>
      (1L, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, x)
    }.toDF("u", "t", "id", "x")
    val got = Journey.cusum(evs, col("u"), col("t"), col("id"), col("x"),
        target = 10L, threshold = 25L)
      .select("n", "n_alarms", "final_s").as[(Long, Long, Long)].head()
    // scalar reference
    var s = 0L; var alarms = 0L
    xs.foreach { x =>
      val s1 = math.max(0L, s + x - 10L)
      if (s1 > 25L) { alarms += 1; s = 0L } else s = s1
    }
    assert(got == ((xs.size.toLong, alarms, s)))
    assert(alarms >= 2) // the fixture actually alarms more than once
  }

  test("cusum: below-target stream never alarms, statistic floors at 0") {
    val evs = (0 until 50).map(i =>
      (1L, ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00"), i.toLong, 3L))
      .toDF("u", "t", "id", "x")
    val got = Journey.cusum(evs, col("u"), col("t"), col("id"), col("x"), 10L, 25L)
      .select("n_alarms", "final_s").as[(Long, Long)].head()
    assert(got == ((0L, 0L)))
  }

  test("resampleFfill: gaps filled forward, grid spans min..max hour") {
    val evs = Seq(
      (1L, ts("2024-01-01 10:10:00"), java.math.BigDecimal.valueOf(5)),
      (1L, ts("2024-01-01 10:40:00"), java.math.BigDecimal.valueOf(3)),
      (1L, ts("2024-01-01 13:05:00"), java.math.BigDecimal.valueOf(2))
    ).toDF("u", "t", "v")
    val r = Journey.resampleFfill(evs, col("u"), col("t"), col("v"))
      .select(date_format(col("bucket"), "HH").cast("int").as("h"),
        col("n_events"), col("filled_value").cast("double"), col("gap"))
      .as[(Int, Long, Double, Int)].collect().sortBy(_._1).toSeq
    assert(r == Seq((10, 2L, 8.0, 0), (11, 0L, 8.0, 1), (12, 0L, 8.0, 1),
      (13, 1L, 2.0, 0)))
  }

  test("sprt: first crossing decides with hand constants; never-crossing " +
      "stream reads continue; constants helper signs and known log2") {
    import java.sql.Timestamp
    def t(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d")
    // l1 = +2, l0 = -1, bound = 5 (raw fixed-point units)
    // g1: S S F S S -> llr 2,4,3,5 crosses UP at rn 4, then keeps going
    // g2: F F F F F F -> llr -1..-5 crosses DOWN at rn 5
    // g3: S F S F -> llr 2,1,3,2 never crosses
    val rows =
      Seq(("g1", 1, 1), ("g1", 2, 1), ("g1", 3, 0), ("g1", 4, 1),
        ("g1", 5, 1)) ++
      (1 to 6).map(i => ("g2", i, 0)) ++
      Seq(("g3", 1, 1), ("g3", 2, 0), ("g3", 3, 1), ("g3", 4, 0))
    val df = rows.map { case (g, i, s) => (g, t(i), i.toLong, s) }
      .toDF("g", "ts", "eid", "s")
    val out = Journey.sprt(df, Seq(col("g")), col("ts"), col("eid"),
      col("s"), l1Fp = 2L, l0Fp = -1L, boundFp = 5L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("decision"), Option(r.getAs[Any]("n_at_decision")),
          r.getAs[Long]("n_events"))).toMap
    assert(out("g1") == (("accept_h1", Some(4), 5L)), s"g1: ${out("g1")}")
    assert(out("g2") == (("accept_h0", Some(5), 6L)), s"g2: ${out("g2")}")
    assert(out("g3")._1 == "continue" && out("g3")._2.isEmpty)
    // constants: signs and the exact 2^20-bit log2 of a power of two
    val (l1, l0, bound) = Journey.sprtConstants(0.25, 0.5, 0.05, 0.05)
    assert(l1 == (1L << 20)) // log2(0.5/0.25) = 1 exactly
    assert(l0 < 0 && bound > 0)
  }

  test("kaplanMeier: hand-computed curve, censor ticks, extinction") {
    import graft.functions.Log2Fixed
    // group A: durations 1(ev) 2(cen) 3(ev) 3(ev) 5(cen)
    //   t=1: n=5 d=1 -> x 4/5; t=2: n=4 c=1 (tick); t=3: n=3 d=2 -> x 1/3;
    //   t=5: n=1 c=1 (tick)
    // group B: 1(ev) 1(ev) -> n=2 d=2 -> extinct at t=1
    val rows = Seq(("A", 1L, 1L), ("A", 2L, 0L), ("A", 3L, 1L),
      ("A", 3L, 1L), ("A", 5L, 0L), ("B", 1L, 1L), ("B", 1L, 1L))
    val out = Journey.kaplanMeier(rows.toDF("g", "dur", "ev"),
        Seq(col("g")), col("dur"), col("ev"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5),
          Option(r.getAs[Any]("survival_bits"))
            .map(_.asInstanceOf[Double])))).toMap
    def lg(x: Long) = Log2Fixed(x)
    val s1 = (lg(4) - lg(5)).toDouble / Log2Fixed.One
    val s3 = (lg(4) - lg(5) + lg(1) - lg(3)).toDouble / Log2Fixed.One
    assert(out(("A", 1L)) == ((5L, 1L, 0L, 0, Some(s1))))
    assert(out(("A", 2L)) == ((4L, 0L, 1L, 0, Some(s1)))) // censor tick
    assert(out(("A", 3L)) == ((3L, 2L, 0L, 0, Some(s3))))
    assert(out(("A", 5L)) == ((1L, 0L, 1L, 0, Some(s3))))
    assert(out(("B", 1L)) == ((2L, 2L, 0L, 1, None))) // S hits exact 0
    // sanity: bits really are log2 of the product
    assert(math.abs(math.pow(2, s3) - 0.8 / 3) < 1e-5)
  }

  test("logRank: hand-computed E/V chain; one-arm null; strong split flags") {
    // A: 1(ev) 3(ev) 5(cen); B: 2(ev) 3(cen) 4(ev)
    // t=1: na=3 nb=3 d=1(da) -> ea .5, v .25 | t=2: na=2 nb=3 d=1(db) ->
    // ea .4, v .24 | t=3: na=2 nb=2 d=1(da) -> ea .5, v .25 | t=4:
    // na=1 nb=1 d=1(db) -> ea .5, v .25 ; u = .1e6, sv = .99e6
    val rows = Seq((1L, 1L, 1L), (1L, 3L, 1L), (1L, 5L, 0L),
      (0L, 2L, 1L), (0L, 3L, 0L), (0L, 4L, 1L))
    val out = Journey.logRank(rows.toDF("a", "dur", "ev"), Seq(lit(1)),
        col("a") === 1, col("dur"), col("ev"))
      .collect().head
    assert(out.getAs[Long]("n_times") == 4L)
    assert(out.getAs[Long]("o_a") == 2L && out.getAs[Long]("o_b") == 2L)
    assert(out.getAs[Double]("e_a") == 1.9 && out.getAs[Double]("e_b") == 2.1)
    assert(out.getAs[Double]("chi2") == 0.010101) // round(1e10/990000)/1e6
    assert(out.getAs[Int]("significant") == 0)
    // one-arm input: every V term 0 -> null chi2, null significant
    val one = Journey.logRank(rows.filter(_._1 == 1L).toDF("a", "dur", "ev"),
        Seq(lit(1)), col("a") === 1, col("dur"), col("ev"))
      .collect().head
    assert(one.getAs[Any]("chi2") == null &&
      one.getAs[Any]("significant") == null)
    // strong separation: A churns day 1, B churns day 100, 30 each
    val split = ((1 to 30).map(_ => (1L, 1L, 1L)) ++
      (1 to 30).map(_ => (0L, 100L, 1L))).toDF("a", "dur", "ev")
    val sp = Journey.logRank(split, Seq(lit(1)), col("a") === 1,
      col("dur"), col("ev")).collect().head
    assert(sp.getAs[Int]("significant") == 1, s"chi2=${sp.getAs[Double]("chi2")}")
  }

  test("attributionUShaped: exact 40/20/40 micro credit, sum = 1e6 per user") {
    def t(i: Int) = ts(f"2024-01-01 00:00:${i}%02d")
    // u1: a b c d P   -> a 400k, b 100k, c 100k, d 400k
    // u2: a P         -> a 1,000,000
    // u3: a b P       -> 500k each
    // u4: a b c P     -> a 400k, b 200k, c 400k
    // u5: a b c d e P -> middles 200000 div 3 = 66666, rem 2 to b
    // u6: a (no conversion) -> nothing
    // u7: P a         -> converts, zero prior touches -> nothing
    val rows = Seq(
      (1L, 1, "a"), (1L, 2, "b"), (1L, 3, "c"), (1L, 4, "d"), (1L, 5, "P"),
      (2L, 1, "a"), (2L, 2, "P"),
      (3L, 1, "a"), (3L, 2, "b"), (3L, 3, "P"),
      (4L, 1, "a"), (4L, 2, "b"), (4L, 3, "c"), (4L, 4, "P"),
      (5L, 1, "a"), (5L, 2, "b"), (5L, 3, "c"), (5L, 4, "d"),
      (5L, 5, "e"), (5L, 6, "P"),
      (6L, 1, "a"),
      (7L, 1, "P"), (7L, 2, "a"))
    val df = rows.map { case (u, i, ch) => (u, t(i), i.toLong, ch) }
      .toDF("u", "ts", "eid", "ch")
    val out = Journey.attributionUShaped(df, col("u"), col("ts"),
        col("eid"), col("ch"), col("ch") === "P")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((400000L + 1000000L + 500000L + 400000L + 400000L,
      5L, 5L, 1L))) // last only for u2 (single touch is both first+last)
    assert(out("b") == ((100000L + 500000L + 200000L + 66668L, 4L, 0L, 1L)))
    assert(out("c") == ((100000L + 400000L + 66666L, 3L, 0L, 1L)))
    assert(out("d") == ((400000L + 66666L, 2L, 0L, 1L)))
    assert(out("e") == ((400000L, 1L, 0L, 1L)))
    // per-user conservation: every converted-with-touches user sums to 1e6
    val total = out.values.map(_._1).sum
    assert(total == 5L * 1000000L, s"credit total $total")
  }
}
