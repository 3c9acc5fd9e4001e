package graft

import graft.sources.KvBlock
import graft.transform.{FormConfig, SurveyTransform}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-parity tests against the reference's OWN fixture data (read-only
  * under /root/reference/data — data files, not code): the KV institution
  * records, the MOE school-major records, and the demo2.json →
  * demo2_chinese.json label-mapping golden pair driven by formConfig.ts.
  */
class GoldenFixturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val RefData = "/root/reference/data"

  test("KV institution fixture parses field-for-field (retrieve.py:909-934)") {
    val df = KvBlock.read(spark, s"$RefData/split_txts/托育机构备案信息_120112000000.txt")
    val rows = df.select(
      KvBlock.field(col("kv"), "机构名称").as("name"),
      KvBlock.field(col("kv"), "统一社会信用代码").as("credit"),
      KvBlock.field(col("kv"), "机构类型").as("typ"),
      KvBlock.field(col("kv"), "备案及完成时间").as("ts"),
      KvBlock.field(col("kv"), "区域编号").as("region"))
      .collect()
    assert(rows.length > 1)
    val first = rows.head
    assert(first.getAs[String]("name") == "天津市津南区乐新幼儿园托育")
    assert(first.getAs[String]("credit") == "52120112MJ0676325C")
    assert(first.getAs[String]("typ") == "非营利性")
    assert(first.getAs[String]("region") == "120112000000")
    // registration timestamps parse with the declared format (FIXTURES.md §1)
    val parsed = df.select(
      to_timestamp(KvBlock.field(col("kv"), "备案及完成时间"), "yyyy-MM-dd HH:mm:ss").as("t"))
    assert(parsed.filter(col("t").isNull).count() == 0)
  }

  test("MOE school-major fixture: ^_^ blocks + major name/code split (retrieve.py:936-974)") {
    val file = new java.io.File(s"$RefData/moe_majors_split").listFiles().head
    val df = KvBlock.read(spark, file.getAbsolutePath)
    val rows = df.select(
      KvBlock.field(col("kv"), "机构名称").as("school"),
      KvBlock.field(col("kv"), "省份").as("province"),
      KvBlock.field(col("kv"), "学校标识码").as("school_code"),
      regexp_extract(KvBlock.field(col("kv"), "开设专业"), "^(.*?)\\s*\\((.*?)\\)\\s*$", 1).as("major_name"),
      regexp_extract(KvBlock.field(col("kv"), "开设专业"), "^(.*?)\\s*\\((.*?)\\)\\s*$", 2).as("major_code"),
      KvBlock.field(col("kv"), "修业年限").cast("int").as("duration"),
      KvBlock.field(col("kv"), "年份").cast("int").as("year"))
    assert(df.count() > 1)
    // every record has the full typed projection
    assert(rows.filter(col("school").isNull || col("province").isNull ||
      col("school_code").isNull || col("major_name") === "" ||
      col("major_code") === "" || col("duration").isNull || col("year").isNull).count() == 0)
    // spot-check a known row from the fixture
    val fudan = rows.filter(col("school") === "复旦大学" && col("major_code") === "630201")
    if (fudan.count() > 0) {
      assert(fudan.head().getAs[String]("major_name") == "护理")
    }
  }

  test("demo2.json → demo2_chinese.json label-mapping golden pair (XFORM)") {
    val cfg = FormConfig.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$RefData/formConfig.ts")), "UTF-8"))
    assert(cfg.options.nonEmpty && cfg.matrixRows.nonEmpty && cfg.matrixCols.nonEmpty)
    val options = cfg.options.map(d => (d.fieldKey, d.code, d.label))
      .toDF("field_key", "code", "label")

    val scalarFields = Seq("orgNature", "gender", "education", "currentPosition",
      "interval", "salaryRange", "isFromTeacherToTeacher", "isPovertyFree",
      "trainingNeeds", "orgType")
    val arrayFields = Seq("reason", "serviceMode")
    val schema = StructType(
      Seq(StructField("orgName", StringType), StructField("totalChildren", StringType),
        StructField("competency_matrix", MapType(StringType, StringType))) ++
        scalarFields.map(StructField(_, StringType)) ++
        arrayFields.map(StructField(_, ArrayType(StringType))))

    def load(name: String) = spark.read.schema(schema)
      .option("multiLine", "true").json(s"$RefData/$name")

    var mapped = load("demo2.json")
    scalarFields.foreach { f =>
      mapped = SurveyTransform.mapCode(mapped, f, f, options, f + "_zh")
    }
    arrayFields.foreach { f =>
      mapped = SurveyTransform.mapCodeArray(mapped, f, f, options, f + "_zh")
    }
    mapped = SurveyTransform.mapMatrixDims(mapped, "competency_matrix",
      cfg.matrixRows.filter(_.fieldKey == "competency_matrix").map(d => d.code -> d.label).toMap,
      cfg.matrixCols.filter(_.fieldKey == "competency_matrix").map(d => d.code -> d.label).toMap,
      "competency_matrix_zh")

    val got = mapped.head()
    val want = load("demo2_chinese.json").head()

    scalarFields.foreach { f =>
      assert(got.getAs[String](f + "_zh") == want.getAs[String](f),
        s"scalar field $f")
    }
    arrayFields.foreach { f =>
      assert(got.getAs[scala.collection.Seq[String]](f + "_zh").toSeq ==
        want.getAs[scala.collection.Seq[String]](f).toSeq, s"array field $f")
    }
    assert(got.getAs[Map[String, String]]("competency_matrix_zh") ==
      want.getAs[Map[String, String]]("competency_matrix"))
    // passthrough fields unchanged
    assert(got.getAs[String]("orgName") == want.getAs[String]("orgName"))
    assert(got.getAs[String]("totalChildren") == want.getAs[String]("totalChildren"))
  }
}
