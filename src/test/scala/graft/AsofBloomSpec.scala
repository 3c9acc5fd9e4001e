package graft

import graft.functions.BloomMightContain
import graft.operators.{AsofJoin, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsofBloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100, "q1"),
    ("A", ts("2024-01-01 10:00:05"), 101, "q2"),
    ("A", ts("2024-01-01 10:00:05"), 102, "q2b"), // tie on ts; id 102 wins backward
    ("A", ts("2024-01-01 10:00:20"), 103, "q3"),
    ("B", ts("2024-01-01 09:00:00"), 200, "q4")
  ).toDF("k", "t", "id", "tag")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:04"), "t1"), // → q1 (100)
    ("A", ts("2024-01-01 10:00:05"), "t2"), // exact match, tie → 102
    ("A", ts("2024-01-01 10:00:30"), "t3"), // → q3 (103)
    ("B", ts("2024-01-01 08:00:00"), "t4"), // before any quote → null
    ("C", ts("2024-01-01 10:00:00"), "t5")  // key with no quotes → null
  ).toDF("k", "t", "trade")

  test("backward as-of: greatest right time <= left time, inclusive, tie by max tiebreak") {
    val out = AsofJoin.backward(
        trades, col("k"), col("t"), quotes, col("k"), col("t"),
        Seq("qid" -> col("id"), "qtag" -> col("tag")), rightTiebreak = col("id"))
      .select("trade", "qid", "qtag")
      .as[(String, Option[Int], Option[String])].collect()
      .map { case (k, v, w) => k -> (v, w) }.toMap
    assert(out("t1") == (Some(100), Some("q1")))
    assert(out("t2") == (Some(102), Some("q2b")))
    assert(out("t3") == (Some(103), Some("q3")))
    assert(out("t4") == (None, None))
    assert(out("t5") == (None, None))
  }

  test("forward as-of: smallest right time >= left time, tie by min tiebreak") {
    val out = AsofJoin.forward(
        trades, col("k"), col("t"), quotes, col("k"), col("t"),
        Seq("qid" -> col("id")), rightTiebreak = col("id"))
      .select("trade", "qid").as[(String, Option[Int])].collect().toMap
    assert(out("t1") == Some(101)) // next at 10:00:05, min id among ties
    assert(out("t2") == Some(101)) // inclusive
    assert(out("t3") == None)      // nothing after 10:00:30
    assert(out("t4") == Some(200))
    assert(out("t5") == None)
  }

  test("as-of matches the quadratic window oracle on real tables") {
    // self as-of on the event stream: last click at or before each error
    val events = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "events")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val clicks = events.filter(col("event_type") === "click")
    val fast = AsofJoin.backward(
        errors, col("e_user"), col("e_ts"),
        clicks, col("user_id"), col("ts"),
        Seq("cid" -> col("event_id")), rightTiebreak = col("event_id"))
      .select(col("event_id"), col("cid")).as[(Long, Option[Long])].collect().toMap
    val clicksR = clicks.select(col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("event_id").as("c_id"))
    val slowExact = errors.join(clicksR,
        col("c_user") === col("e_user") && col("c_ts") <= col("e_ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("c_ts"), col("c_id"))).as("m"))
      .select(col("event_id"), col("m.c_id").as("cid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == slowExact)
    assert(fast.values.exists(_.isDefined), "degenerate: no as-of matches at all")
  }

  test("bloom expr: no false negatives; serializable across the plan") {
    val keys = (1 to 500).map(_.toLong)
    val bloom = keys.toDF("k").stat.bloomFilter("k", 500, 0.01)
    val probed = (1 to 1000).map(_.toLong).toDF("k")
      .filter(BloomMightContain.expr(col("k"), bloom))
      .as[Long].collect().toSet
    assert(keys.forall(probed.contains)) // zero false negatives
    assert(probed.size < 600)            // fpp keeps extras bounded
  }

  test("bloom semi-join is bit-identical to plain left_semi") {
    val fact = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "lineitem")
    val dim = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val viaBloom = Skew.bloomSemiJoin(fact, col("l_orderkey"), dim, col("o_orderkey"),
        expectedItems = 10000L)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(viaBloom == plain)
  }

  test("bloom string keys probe via mightContainString") {
    val bloom = Seq("alpha", "beta").toDF("s").stat.bloomFilter("s", 100, 0.01)
    val hit = Seq("alpha", "beta", "gamma", "delta").toDF("s")
      .filter(BloomMightContain.expr(col("s"), bloom)).as[String].collect().toSet
    assert(Set("alpha", "beta").subsetOf(hit))
  }
}
