package graft

import graft.functions.DateFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DateFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.cast("string").as("r")).head().get(0)

  test("all five reference formats parse to the same date (LINKS:40-46)") {
    val inputs = Seq("2023-04-05", "2023/04/05", "2023.04.05", "2023年04月05日", "20230405")
    inputs.foreach { in =>
      assert(one(parseMultiFormat(lit(in))) == "2023-04-05", s"input $in")
    }
    assert(one(parseMultiFormat(lit("not a date"))) == null)
  }

  test("bare year falls back to Jan 1 (retrieve.py:1311-1318)") {
    assert(one(parseWithYearFallback(lit("2021"))) == "2021-01-01")
  }

  test("relative dates resolve against an anchor (LINKS:61-95)") {
    val anchor = lit("2024-06-01").cast("date")
    assert(one(parseRelative(lit("3天前"), anchor)) == "2024-05-29")
    assert(one(parseRelative(lit("2周前"), anchor)) == "2024-05-18")
    assert(one(parseRelative(lit("1月前"), anchor)) == "2024-05-02")   // 30 days
    assert(one(parseRelative(lit("1年前"), anchor)) == "2023-06-02")   // 365 days
    assert(one(parseRelative(lit("gibberish"), anchor)) == null)
  }

  test("ranges split on ' - ' and '~' (retrieve.py:1280-1307)") {
    assert(one(parseRange(lit("2020 - 2022")).getField("start")) == "2020-01-01")
    assert(one(parseRange(lit("2020 - 2022")).getField("end")) == "2022-01-01")
    assert(one(parseRange(lit("2021")).getField("start")) == "2021-01-01")
    assert(one(parseRange(lit("2021")).getField("end")) == "2021-01-01")
  }

  test("missing date rejected when filter set (P9)") {
    val start = lit("2020-01-01").cast("date")
    val end = lit("2020-12-31").cast("date")
    assert(one(inRange(lit(null).cast("date"), start, end)) == "false")
    assert(one(inRange(lit("2020-06-01").cast("date"), start, end)) == "true")
  }

  test("mmss formatting (DIFYX:93-103) and W3 running offsets") {
    assert(one(mmss(lit(78.0))) == "01:18")
    // Reference-shaped scene fixture: cumulative offsets over durations.
    val scenes = Seq((1, 3.0), (2, 15.0), (3, 7.0)).toDF("idx", "duration")
    val out = graft.operators.Sessionize
      .runningOffset(scenes.withColumn("g", lit(1)), col("g"), col("idx"), col("duration"))
      .orderBy("idx")
      .select(mmss(col("offset")))
      .as[String].collect().toSeq
    assert(out == Seq("00:00", "00:03", "00:18"))
  }

  test("absolute-vs-relative subtitle disambiguation (DIFYX:193-208)") {
    val df = Seq((5.0, 3.0), (2.0, 18.0)).toDF("raw", "offset")
    val got = df.select(graft.operators.Sessionize
      .resolveAbsoluteTime(col("raw"), col("offset"))).as[Double].collect().toSeq
    assert(got == Seq(5.0, 20.0))
  }

  test("W3 end-to-end: scene offsets + mixed abs/rel subtitle resolution (DIFYX:193-208)") {
    import graft.operators.Sessionize
    // one video, three scenes of 10s/20s/30s → offsets 0/10/30; subtitle
    // times arrive mixed: already-absolute values pass through, scene-
    // relative values shift by the scene's offset
    val scenes = Seq(
      ("v1", 1, 10.0, 4.0),   // offset 0:  4 >= 0  → absolute 4.0
      ("v1", 2, 20.0, 5.0),   // offset 10: 5 < 10  → relative → 15.0
      ("v1", 3, 30.0, 42.0)   // offset 30: 42 >= 30 → absolute 42.0
    ).toDF("video", "scene", "duration", "raw")
    val resolved = Sessionize.runningOffset(
        scenes, col("video"), col("scene"), col("duration"))
      .withColumn("t", Sessionize.resolveAbsoluteTime(col("raw"), col("offset")))
      .orderBy(col("scene"))
      .select(col("offset"), col("t")).as[(Double, Double)].collect().toSeq
    assert(resolved == Seq((0.0, 4.0), (10.0, 15.0), (30.0, 42.0)))
  }
}
