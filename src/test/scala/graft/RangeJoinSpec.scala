package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val points = Seq(
    ("u1", ts("2024-01-01 10:00:00"), 1L),
    ("u1", ts("2024-01-01 10:29:59"), 2L),
    ("u1", ts("2024-01-01 10:30:00"), 3L), // == interval end: excluded (half-open)
    ("u1", ts("2024-01-01 11:00:00"), 4L),
    ("u2", ts("2024-01-01 10:05:00"), 5L), // other key
    ("u1", ts("2024-01-02 10:05:00"), 6L)  // next day
  ).toDF("p_user", "p_ts", "p_id")

  private lazy val intervals = Seq(
    ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), "w1"),
    ("u1", ts("2024-01-01 10:45:00"), ts("2024-01-01 11:00:01"), "w2"),
    ("u2", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), "w3")
  ).toDF("i_user", "i_start", "i_end", "w")

  private def run(binSeconds: Long) = RangeJoin.pointInInterval(
      points, col("p_user"), col("p_ts"),
      intervals, col("i_user"), col("i_start"), col("i_end"),
      binWidthSeconds = binSeconds)
    .select("p_id", "w").as[(Long, String)].collect().toSet

  private val expected = Set(
    1L -> "w1", 2L -> "w1", // 3 excluded: ts == end, half-open
    4L -> "w2",             // end+1µs windows include the boundary point
    5L -> "w3")

  test("point-in-interval: half-open bounds, key isolation") {
    assert(run(binSeconds = 1800L) == expected)
  }

  test("bin width does not change results, only the explode factor") {
    // smaller than, equal to, and much larger than the interval length;
    // bucket-boundary-aligned and not
    for (bin <- Seq(1L, 60L, 900L, 1800L, 3600L, 86400L, 7L))
      assert(run(bin) == expected, s"bin=$bin")
  }

  test("left_outer keeps unmatched points with null interval side") {
    val out = RangeJoin.pointInInterval(
        points, col("p_user"), col("p_ts"),
        intervals, col("i_user"), col("i_start"), col("i_end"),
        binWidthSeconds = 1800L, joinType = "left_outer")
      .select("p_id", "w").as[(Long, Option[String])].collect().toSet
    assert(out.contains(3L -> None) && out.contains(6L -> None))
    assert(out.filter(_._2.isDefined).map(p => p._1 -> p._2.get) == expected)
  }

  test("band join is inclusive both ends") {
    val left = Seq(("k", ts("2024-01-01 10:00:00"), "L")).toDF("lk", "lt", "l")
    val right = Seq(
      ("k", ts("2024-01-01 09:59:00"), "exact-low"),   // t - 60s: included
      ("k", ts("2024-01-01 10:01:00"), "exact-high"),  // t + 60s: included
      ("k", ts("2024-01-01 09:58:59"), "below"),
      ("k", ts("2024-01-01 10:01:01"), "above")
    ).toDF("rk", "rt", "r")
    val out = RangeJoin.band(left, col("lk"), col("lt"),
        right, col("rk"), col("rt"), toleranceSeconds = 60L)
      .select("r").as[String].collect().toSet
    assert(out == Set("exact-low", "exact-high"))
  }

  test("matches the naive theta-join oracle on real tables") {
    val ev = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "events")
    val anchors = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("w_start"), (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    val pts = ev.select(col("event_id").as("p_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"))
    val binned = RangeJoin.pointInInterval(pts, col("p_user"), col("p_ts"),
        anchors, col("a_user"), col("w_start"), col("w_end"), binWidthSeconds = 3600L)
      .select("a_id", "p_id").as[(Long, Long)].collect().toSet
    val naive = pts.join(anchors,
        col("p_user") === col("a_user") && col("p_ts") >= col("w_start") &&
          col("p_ts") < col("w_end"))
      .select("a_id", "p_id").as[(Long, Long)].collect().toSet
    assert(binned == naive && binned.nonEmpty)
  }

  // ---- interval×interval overlap -------------------------------------------

  test("intervalOverlap: matches the theta join at every bin width") {
    val rnd = new scala.util.Random(11)
    def mk(tag: String, n: Int) = (1 to n).map { i =>
      val s = 1700000000L + rnd.nextInt(7200)
      (s"${tag}$i", s"u${rnd.nextInt(4)}", new Timestamp(s * 1000L),
        new Timestamp((s + 1 + rnd.nextInt(900)) * 1000L))
    }.toDF(s"${tag}_id", s"${tag}_u", s"${tag}_s", s"${tag}_e")
    val l = mk("l", 80)
    val r = mk("r", 80)
    val naive = l.join(r,
        col("l_u") === col("r_u") && col("l_s") < col("r_e") &&
          col("r_s") < col("l_e"))
      .select("l_id", "r_id").as[(String, String)].collect().toSet
    assert(naive.nonEmpty)
    for (bw <- Seq(1L, 60L, 300L, 3600L, 100000L)) {
      val binned = RangeJoin.intervalOverlap(
          l, col("l_u"), col("l_s"), col("l_e"),
          r, col("r_u"), col("r_s"), col("r_e"), bw)
        .select("l_id", "r_id").as[(String, String)].collect().toSeq
      assert(binned.size == binned.toSet.size, s"bw=$bw emitted duplicates")
      assert(binned.toSet == naive, s"bw=$bw")
    }
  }

  test("intervalOverlap: half-open — touching intervals do not match") {
    val l = Seq(("a", "u", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("l_id", "l_u", "l_s", "l_e")
    val r = Seq(("b", "u", ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("r_id", "r_u", "r_s", "r_e")
    assert(RangeJoin.intervalOverlap(l, col("l_u"), col("l_s"), col("l_e"),
      r, col("r_u"), col("r_s"), col("r_e"), 60).count() == 0)
  }

  test("intervalOverlap: degenerate (end <= start) intervals are dropped") {
    // a zero-length interval strictly inside another satisfies the strict
    // predicate s1<e2 && s2<e1 despite an EMPTY half-open intersection —
    // such rows are filtered before binning (ADVICE r7)
    val l = Seq(
      ("zero", "u", ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00")),
      ("neg", "u", ts("2024-01-01 10:40:00"), ts("2024-01-01 10:20:00")),
      ("real", "u", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("l_id", "l_u", "l_s", "l_e")
    val r = Seq(("big", "u", ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("r_id", "r_u", "r_s", "r_e")
    val out = RangeJoin.intervalOverlap(l, col("l_u"), col("l_s"), col("l_e"),
        r, col("r_u"), col("r_s"), col("r_e"), 60)
      .select("l_id").as[String].collect().toSet
    assert(out == Set("real"))
  }
}
