package graft

import graft.operators.AsofJoin
import graft.plans.{AsofMergeJoin, AsofMergeJoinExec}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole-operator as-of join (custom LogicalPlan + Strategy +
  * BinaryExecNode) against hand-built edges and against the composable
  * union+window form, which is its executable specification.
  */
class AsofMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hand-built edges: match, tie, no-match, null key, null ts") {
    val left = Seq(
      (1L, java.lang.Long.valueOf(10L), ts("2024-01-01 10:00:00")),
      (2L, java.lang.Long.valueOf(10L), ts("2024-01-01 09:00:00")), // before any right
      (3L, java.lang.Long.valueOf(20L), ts("2024-01-01 12:00:00")), // tie on right ts
      (4L, null.asInstanceOf[java.lang.Long], ts("2024-01-01 10:00:00")), // null key
      (5L, java.lang.Long.valueOf(10L), null.asInstanceOf[java.sql.Timestamp]) // null ts
    ).toDF("id", "k", "t")
    val right = Seq(
      (java.lang.Long.valueOf(10L), ts("2024-01-01 09:30:00"), 100L),
      (java.lang.Long.valueOf(10L), ts("2024-01-01 10:00:00"), 101L), // equal ts eligible
      (java.lang.Long.valueOf(20L), ts("2024-01-01 11:00:00"), 200L),
      (java.lang.Long.valueOf(20L), ts("2024-01-01 11:00:00"), 201L), // tiebreak-max wins
      (null.asInstanceOf[java.lang.Long], ts("2024-01-01 08:00:00"), 300L) // null key: never matches
    ).toDF("rk", "rt", "payload")

    val out = AsofJoin.backwardMerge(left, right,
        Seq("k"), Seq("rk"), "t", "rt", rightTiebreak = Some("payload"))
      .select(col("id"), col("payload"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> Some(101L), 2L -> None, 3L -> Some(201L), 4L -> None, 5L -> None))
  }

  test("equivalence with the union+window specification on real events") {
    val events = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "events")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val clicks = events.filter(col("event_type") === "click")

    val spec = AsofJoin.backward(
        errors, col("e_user"), col("e_ts"),
        clicks, col("user_id"), col("ts"),
        Seq("last_click_id" -> col("event_id")), rightTiebreak = col("event_id"))
      .select(col("event_id"), col("last_click_id"))
      .as[(Long, Option[Long])].collect().toMap

    val merged = AsofJoin.backwardMerge(
        errors,
        clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("last_click_id")),
        Seq("e_user"), Seq("c_user"), "e_ts", "c_ts",
        rightTiebreak = Some("last_click_id"))
      .select(col("event_id"), col("last_click_id"))
      .as[(Long, Option[Long])].collect().toMap

    assert(merged.nonEmpty && merged == spec)
  }

  test("mismatched key types fail construction instead of silently not matching") {
    val left = Seq((1L, 10, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t") // k: int
    val right = Seq((10L, ts("2024-01-01 09:00:00"), 5L)).toDF("rk", "rt", "p") // rk: long
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backwardMerge(left, right, Seq("k"), Seq("rk"), "t", "rt")
    }
    assert(e.getMessage.contains("key types must match"))
  }

  test("forward merge: earliest eligible right row; ties pick tiebreak-min") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // matches equal-ts row
      (2L, 10L, ts("2024-01-01 11:30:00")),  // after all right rows -> none
      (3L, 20L, ts("2024-01-01 10:00:00"))   // tie: payload 200 (min) wins
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100L),
      (10L, ts("2024-01-01 11:00:00"), 101L),
      (20L, ts("2024-01-01 11:00:00"), 201L),
      (20L, ts("2024-01-01 11:00:00"), 200L)
    ).toDF("rk", "rt", "payload")
    val out = AsofJoin.forwardMerge(left, right,
        Seq("k"), Seq("rk"), "t", "rt", rightTiebreak = Some("payload"))
      .select(col("id"), col("payload"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> None, 3L -> Some(200L)))
  }

  test("forward merge: a right row serves MULTIPLE later left rows") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 08:00:00")),
      (2L, 7L, ts("2024-01-01 08:30:00")),
      (3L, 7L, ts("2024-01-01 09:00:00"))   // all resolve to the same 09:00 row
    ).toDF("id", "k", "t")
    val right = Seq((7L, ts("2024-01-01 09:00:00"), 900L)).toDF("rk", "rt", "payload")
    val out = AsofJoin.forwardMerge(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("id"), col("payload")).as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(900L), 2L -> Some(900L), 3L -> Some(900L)))
  }

  test("forward merge equals the union+window forward form on real events") {
    val events = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "events")
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val clicks = events.filter(col("event_type") === "click")

    val spec = AsofJoin.forward(
        errors, col("e_user"), col("e_ts"),
        clicks, col("user_id"), col("ts"),
        Seq("next_click_id" -> col("event_id")), rightTiebreak = col("event_id"))
      .select(col("event_id"), col("next_click_id"))
      .as[(Long, Option[Long])].collect().toMap

    val merged = AsofJoin.forwardMerge(
        errors,
        clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("next_click_id")),
        Seq("e_user"), Seq("c_user"), "e_ts", "c_ts",
        rightTiebreak = Some("next_click_id"))
      .select(col("event_id"), col("next_click_id"))
      .as[(Long, Option[Long])].collect().toMap

    assert(merged.nonEmpty && merged == spec)
  }

  test("plans as the custom exec; left-only filters are pushed below the node") {
    // parquet-backed sides: a LocalRelation left would let
    // ConvertToLocalRelation eagerly evaluate the pushed filter away
    val events = graft.core.Tables.load(spark, SparkTestSession.Sf0001, "events")
    val left = events.select(col("event_id").as("id"), col("user_id").as("k"),
      col("ts").as("t"))
    val right = events.select(col("user_id").as("rk"), col("ts").as("rt"),
      col("event_id").as("p"))
    val df = AsofJoin.backwardMerge(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .filter(col("id") > 0)

    val optimized = df.queryExecution.optimizedPlan
    val node = optimized.collectFirst { case j: AsofMergeJoin => j }
    assert(node.isDefined, optimized)
    // the id > 0 predicate must sit BELOW the as-of node, on its left child
    assert(node.get.left.collectFirst {
      case f: LFilter if f.condition.toString.contains("id") => f
    }.isDefined, node.get.left)
    assert(optimized.collectFirst {
      case f: LFilter if f.condition.toString.contains("id") &&
        f.child.isInstanceOf[AsofMergeJoin] => f
    }.isEmpty, "filter should not remain above the join")

    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect);
    // assert on the rendered plan: custom exec present, and the left-side
    // predicate reached the parquet scan itself
    val rendered = df.queryExecution.executedPlan.toString
    assert(rendered.contains("AsofMergeJoin"), rendered)
    assert(rendered.contains("GreaterThan(event_id,0)"), rendered)
  }
}
