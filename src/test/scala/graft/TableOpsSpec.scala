package graft

import graft.operators.TableOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff: added/removed/changed/unchanged with null-safe compare") {
    val oldDf = Seq(
      (1L, Some("a"), Some(10)), // unchanged
      (2L, Some("b"), Some(20)), // changed: v
      (3L, None: Option[String], Some(30)), // changed: s null -> value
      (4L, Some("d"), None: Option[Int]), // removed
      (5L, None: Option[String], None: Option[Int]) // unchanged (null == null)
    ).toDF("k", "s", "v")
    val newDf = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), Some(21)),
      (3L, Some("c"), Some(30)),
      (5L, None: Option[String], None: Option[Int]),
      (6L, Some("f"), Some(60)) // added
    ).toDF("k", "s", "v")
    val r = TableOps.snapshotDiff(oldDf, newDf, Seq("k"), Seq("s", "v"))
      .select("k", "change_type", "changed_cols")
      .as[(Long, String, String)].collect().toSet
    assert(r == Set(
      (1L, "unchanged", ""), (2L, "changed", "v"), (3L, "changed", "s"),
      (4L, "removed", ""), (5L, "unchanged", ""), (6L, "added", "")))
  }

  test("snapshotDiff: composite keys and multi-column change lists sorted") {
    val oldDf = Seq((1L, "x", "p", 1.0)).toDF("k1", "k2", "a", "b")
    val newDf = Seq((1L, "x", "q", 2.0)).toDF("k1", "k2", "a", "b")
    val r = TableOps.snapshotDiff(oldDf, newDf, Seq("k1", "k2"), Seq("b", "a"))
      .select("change_type", "changed_cols").as[(String, String)].collect().toSeq
    assert(r == Seq(("changed", "a,b")))
  }

  test("columnProfile: nulls counted, distinct excludes nulls, min/max strings") {
    val df = Seq(
      (Some("b"), Some(2)), (Some("a"), Some(2)),
      (None: Option[String], Some(9)), (Some("a"), None: Option[Int])
    ).toDF("s", "v")
    val r = TableOps.columnProfile(df, Seq("s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("s") == ("s", 4L, 1L, 2L, "a", "b"))
    assert(r("v") == ("v", 4L, 1L, 2L, "2", "9"))
  }

  test("columnProfile: one job, output rows == column count") {
    val df = (1L to 100L).map(i => (i, s"s$i")).toDF("a", "b")
    val out = TableOps.columnProfile(df, Seq("a", "b"))
    assert(out.count() == 2)
    assert(out.select("n_distinct").as[Long].collect().toSeq == Seq(100L, 100L))
  }

  // ---- contentDigest --------------------------------------------------------

  private def digest(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
    TableOps.contentDigest(df, cols).as[(Long, Long)].head()

  test("contentDigest: order- and partition-independent, change-sensitive") {
    val rows = (1L to 500L).map(i => (i, s"v$i"))
    val a = digest(rows.toDF("k", "v"), Seq("k", "v"))
    val b = digest(scala.util.Random.shuffle(rows).toDF("k", "v")
      .repartition(13), Seq("k", "v"))
    assert(a == b && a._1 == 500L)
    val mutated = rows.updated(250, (251L, "vX"))
    assert(digest(mutated.toDF("k", "v"), Seq("k", "v")) != a)
  }

  test("contentDigest: null position and cell boundaries matter") {
    val an = digest(Seq(("a", null: String)).toDF("x", "y"), Seq("x", "y"))
    val na = digest(Seq((null: String, "a")).toDF("x", "y"), Seq("x", "y"))
    assert(an != na)
    val abc = digest(Seq(("ab", "c")).toDF("x", "y"), Seq("x", "y"))
    val abc2 = digest(Seq(("a", "bc")).toDF("x", "y"), Seq("x", "y"))
    assert(abc != abc2)
  }

  // ---- histogramInt ---------------------------------------------------------

  test("histogramInt: bins partition the range, counts sum to n") {
    val xs = Seq(-50L, -49L, 0L, 1L, 7L, 49L, 50L) ++ (1L to 93L).map(_ % 50)
    val out = TableOps.histogramInt(xs.toDF("x"), col("x"), 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._3).sum == xs.size)
    assert(out.forall { case (bin, _, _) => bin >= 0 && bin < 10 })
    // brute-force bin assignment with the same integer formula
    val lo = xs.min; val hi = xs.max
    val brute = xs.groupBy(x => (x - lo) * 10 / (hi - lo + 1))
      .map { case (b, g) => (b, g.min, g.size.toLong) }.toSeq.sortBy(_._1)
    assert(out.toSeq == brute)
  }

  test("histogramInt: single-value input lands in bin 0") {
    val out = TableOps.histogramInt(Seq(42L, 42L).toDF("x"), col("x"), 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 42L, 2L)))
  }
}
