package graft

import graft.dims.Regions
import graft.sources.Records
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecordsRegionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val RefData = "/root/reference/data"

  test("typed institution Dataset from a real fixture (X1 dispatch + FIXTURES §1)") {
    val ds = Records.institutions(spark,
      s"$RefData/split_txts/托育机构备案信息_120112000000.txt")
    val recs = ds.collect()
    assert(recs.nonEmpty)
    assert(recs.forall(_.credit_code.nonEmpty))
    assert(recs.forall(_.registration_time != null))
    assert(recs.head.name == "天津市津南区乐新幼儿园托育")
    assert(recs.forall(_.region_code == "120112000000"))
  }

  test("typed MOE Dataset from a real fixture (FIXTURES §2)") {
    val file = new java.io.File(s"$RefData/moe_majors_split").listFiles().head
    val ds = Records.moeMajors(spark, file.getAbsolutePath)
    val recs = ds.collect()
    assert(recs.nonEmpty)
    assert(recs.forall(r => r.major_code.nonEmpty && r.major_name.nonEmpty))
    assert(recs.forall(_.year.exists(_ > 1990)))
  }

  test("auto_parse dispatch distinguishes the three record types") {
    val inst = map(lit("统一社会信用代码"), lit("91X"), lit("机构名称"), lit("甲"))
    val moe = map(lit("学校标识码"), lit("10246"), lit("机构名称"), lit("乙"))
    val survey = map(lit("岗位"), lit("保育员"))
    val got = Seq(1).toDF("x").select(
      Records.recordType(inst).as("a"),
      Records.recordType(moe).as("b"),
      Records.recordType(survey).as("c")).head()
    assert(got.getString(0) == "institution")
    assert(got.getString(1) == "school_major")
    assert(got.getString(2) == "survey")
  }

  test("region resolution: longest city first, city implies province, fallbacks") {
    val locs = Seq(
      "江苏省泰州市兴化市某某镇",     // contains 泰州 AND 兴化 — longest tie → deterministic
      "浙江省杭州市西湖区",
      "吉林省吉林市昌邑区",           // the province==city special case
      "山西某地",                     // province only
      "火星基地一号")                 // unresolvable
      .toDF("loc")
    val got = Regions.resolve(locs, "loc")
      .select("loc", "province", "city").as[(String, Option[String], Option[String])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("浙江省杭州市西湖区") == ((Some("浙江"), Some("杭州"))))
    // province==city special case (retrieve.py:1127-1137): the text says
    // 市, so 吉林 is confirmed as a CITY (dimension name is the bare 吉林)
    assert(got("吉林省吉林市昌邑区") == ((Some("吉林"), Some("吉林"))))
    assert(got("山西某地") == ((Some("山西"), None)))
    assert(got("火星基地一号") == ((None, None)))
    val js = got("江苏省泰州市兴化市某某镇")
    assert(js._1.contains("江苏"))
    assert(js._2.contains("泰州"))
  }

  test("region resolution: reference special cases on the full dimension") {
    val locs = Seq(
      "吉林",             // province==city, no 市 → province query
      "吉林市",           // province==city WITH 市 → city query
      "天津市河北区",     // 天津 city (first in its own list) beats the 河北 district
      "辽宁省朝阳市",     // 朝阳: declared under 北京 first, overwritten to 辽宁
      "朝阳区某街道",     // global fallback: reverse index maps 朝阳 → 辽宁
      "张家界forever")    // global city fallback fixes the province too
      .toDF("loc")
    val got = Regions.resolve(locs, "loc")
      .select("loc", "province", "city").as[(String, Option[String], Option[String])]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("吉林") == ((Some("吉林"), None)))
    assert(got("吉林市") == ((Some("吉林"), Some("吉林"))))
    // scoped search is stable longest-first: 天津 precedes 河北 in 天津's
    // own city list, and the 市 in the text confirms it as a city
    assert(got("天津市河北区") == ((Some("天津"), Some("天津"))))
    assert(got("辽宁省朝阳市") == ((Some("辽宁"), Some("朝阳"))))
    assert(got("朝阳区某街道") == ((Some("辽宁"), Some("朝阳"))))
    assert(got("张家界forever") == ((Some("湖南"), Some("张家界"))))
  }

  test("normalizeRegion strips one suffix, longest first, keeps >=1 char") {
    val got = Seq("四川省", "成都市", "内蒙古自治区", "香港特别行政区", "延边自治州", "市")
      .toDF("r").select(Regions.normalizeRegion(col("r"))).as[String].collect().toSeq
    assert(got == Seq("四川", "成都", "内蒙古", "香港", "延边", "市"))
  }

  test("P6 region-rule match: city exact, province covers its cities") {
    val rules = Seq("杭州", "江苏", "外太空").toDF("rule")
    val docs = Seq("浙江省杭州市", "江苏省苏州市工业园", "浙江省宁波市", "外太空殖民地")
      .toDF("docloc")
    val r = Regions.resolve(rules, "rule")
      .withColumnRenamed("province", "rp").withColumnRenamed("city", "rc")
    val d = Regions.resolve(docs, "docloc")
      .withColumnRenamed("province", "dp").withColumnRenamed("city", "dc")
    val matches = r.crossJoin(d)
      .filter(Regions.regionMatch(col("rp"), col("rc"), col("dp"), col("dc"),
        col("rule"), col("docloc")))
      .select("rule", "docloc").as[(String, String)].collect().toSet
    assert(matches.contains(("杭州", "浙江省杭州市")))
    assert(!matches.contains(("杭州", "浙江省宁波市")))       // city rule ≠ other city
    assert(matches.contains(("江苏", "江苏省苏州市工业园")))   // province covers city
    assert(matches.contains(("外太空", "外太空殖民地")))       // substring fallback
    assert(matches.size == 3)
  }

  test("resolve preserves duplicate location rows (row identity, not loc text)") {
    val locs = Seq(("d1", "浙江省杭州市"), ("d2", "浙江省杭州市"), ("d3", "山西某地"))
      .toDF("doc_id", "loc")
    val got = Regions.resolve(locs, "loc")
    assert(got.count() == 3)
    assert(got.select("doc_id").as[String].collect().toSet == Set("d1", "d2", "d3"))
  }

  test("MOE major without a parenthesized code keeps the name (no silent loss)") {
    val tmp = java.nio.file.Files.createTempFile("moe", ".txt")
    java.nio.file.Files.writeString(tmp,
      "机构名称：某校\n省份：上海市\n学校标识码：10001\n开设专业：护理\n修业年限：3\n年份：2013\n备注：")
    val recs = Records.moeMajors(spark, tmp.toString).collect()
    assert(recs.length == 1)
    assert(recs.head.major_name == "护理")
    assert(recs.head.major_code == "")
  }
}
