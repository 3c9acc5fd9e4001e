package graft

import graft.transform.SurveyTransform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's golden label-mapping pair (demo2.json →
  * demo2_chinese.json / test_output.json): orgNature code → 民办, matrix
  * translated on both axes, unknown codes pass through.
  */
class SurveyTransformSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val options = Seq(
    ("orgNature", "2", "民办"),
    ("orgNature", "1", "公办"),
    ("serviceModes", "a", "全日托"),
    ("serviceModes", "b", "半日托"))
    .toDF("field_key", "code", "label")

  private lazy val matrix = Seq(
    ("quality", "r1", "责任心", "c1", "非常重要"),
    ("quality", "r2", "耐心", "c2", "一般"))
    .toDF("field_key", "row_code", "row_label", "col_code", "col_label")

  test("scalar code mapping with passthrough fallback") {
    val df = Seq("2", "1", "weird").toDF("orgNature")
    val got = SurveyTransform.mapCode(df, "orgNature", "orgNature", options, "label")
      .select("label").as[String].collect().toSet
    assert(got == Set("民办", "公办", "weird"))
  }

  test("array codes mapped element-wise") {
    val df = Seq(Seq("a", "b", "zz")).toDF("modes")
    val got = SurveyTransform.mapCodeArray(df, "modes", "serviceModes", options, "labels")
      .select("labels").as[Seq[String]].head()
    assert(got == Seq("全日托", "半日托", "zz"))
  }

  test("matrix mapped on both row and column axes (XFORM:90-99)") {
    val df = Seq(Map("r1" -> "c1", "r2" -> "c2", "rX" -> "cX")).toDF("answers")
    val got = SurveyTransform.mapMatrix(df, "answers", "quality", matrix, "labeled")
      .select("labeled").as[Map[String, String]].head()
    assert(got == Map("责任心" -> "非常重要", "耐心" -> "一般", "rX" -> "cX"))
  }

  test("X10 markdown report renders deterministically with capacity warning") {
    val df = Seq(
      ("向阳托育园", "上海", "民办", true, Seq("全日托", "计时托"), 120, 150),
      ("小小园", "北京", "公办", false, Seq("半日托"), 60, 40))
      .toDF("name", "city", "subject", "puhui", "modes", "cap", "cur")
    val got = df.select(SurveyTransform.institutionReport(
      col("name"), col("city"), col("subject"), col("puhui"),
      col("modes"), col("cap"), col("cur")).as("md"))
      .as[String].collect()
    assert(got(0).contains("## 向阳托育园（上海）"))
    assert(got(0).contains("| 是否普惠 | 是 |"))
    assert(got(0).contains("| 服务模式 | 全日托、计时托 |"))
    assert(got(0).contains("在托人数超出核定规模"))
    assert(!got(1).contains("超出核定规模"))
    assert(got(1).contains("| 是否普惠 | 否 |"))
  }
}
