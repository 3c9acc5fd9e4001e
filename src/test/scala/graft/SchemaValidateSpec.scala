package graft

import graft.operators.SchemaValidate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Draft-07 schema-as-contract validation against the reference's own
  * survey_schema.json (SURVEY §1.3/§5). q201 covers the oracle surface;
  * this spec pins the bundled schema byte-identical to the reference
  * file and exercises the semantics q201's generated records don't
  * reach: wrong-typed parent sections, nested items-of-objects, and the
  * absent-vs-json-null distinction.
  */
class SchemaValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def viols(json: String): Seq[String] = {
    val df = Seq(json).toDF("j")
    SchemaValidate.validate(df, col("j"), SchemaValidate.surveySchema)
      .select("violations").as[Seq[String]].head()
  }

  test("bundled schema copy is byte-identical to the reference file") {
    val ref = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/survey_schema.json"))
    val in = getClass.getResourceAsStream("/graft/survey_schema.json")
    val bundled = in.readAllBytes(); in.close()
    assert(java.util.Arrays.equals(ref, bundled),
      "src/main/resources/graft/survey_schema.json drifted from the reference contract")
  }

  test("parsed model matches the contract's shape") {
    val s = SchemaValidate.surveySchema
    assert(s.typ.contains("object"))
    assert(s.properties.map(_._1) == Seq("institution_info", "personal_info",
      "employment_info", "position_details", "manager_specific_info"))
    val inst = s.properties.toMap.apply("institution_info")
    assert(inst.required.size == 9 && inst.required.contains("is_puhui"))
    assert(inst.properties.toMap.apply("subject_type").enumVals ==
      Seq("公办", "民办", "公办民营/民办公助"))
    val emp = s.properties.toMap.apply("employment_info")
    assert(emp.properties.toMap.apply("job_change_reasons").maxItems.contains(3))
    // root object has NO required list: records may omit whole sections
    assert(s.required.isEmpty)
  }

  test("a complete valid record has zero violations") {
    val ok = """{"institution_info":{"name":"n","city":"c","subject_type":"公办",
      "specific_form":"其他","is_puhui":true,"service_modes":["全日托"],
      "total_capacity":10,"current_enrollment":5,"staff_count":3},
      "personal_info":{"gender":"男","education":"硕士","major":"m"},
      "employment_info":{"current_position":"保育员","job_change_interval":"i",
      "salary_range":"s","is_kindergarten_transition":false,
      "job_change_reasons":["a","b","c"]}}""".replaceAll("\n\\s*", "")
    assert(viols(ok) == Nil)
    assert(viols("{}") == Nil) // no section is required at the root
  }

  test("absent key vs json null: missing: vs type:") {
    // absent name -> required violation; null name -> present (passes
    // required) but VOID fails the string type check — draft-07 has no
    // nullable here
    val absent = """{"personal_info":{"gender":"男","education":"硕士"}}"""
    assert(viols(absent) == Seq("missing:personal_info.major"))
    val jsonNull =
      """{"personal_info":{"gender":"男","education":"硕士","major":null}}"""
    assert(viols(jsonNull) == Seq("type:personal_info.major"))
  }

  test("wrong-typed section reports type:, with no missing: cascade") {
    // institution_info as an array: its 9 required fields must NOT each
    // report missing (the parent-is-object gate), just the section type
    assert(viols("""{"institution_info":[1,2]}""") ==
      Seq("type:institution_info"))
  }

  test("items-of-objects recurse: required + type inside array elements") {
    // shortage_positions: array of {position: string, count: integer}
    val bad = """{"manager_specific_info":{"recruitment_training":{
      "shortage_positions":[{"position":"保育员","count":"2"}]}}}"""
      .replaceAll("\n\\s*", "")
    assert(viols(bad) == Seq(
      "items:manager_specific_info.recruitment_training.shortage_positions"))
    val ok = """{"manager_specific_info":{"recruitment_training":{
      "shortage_positions":[{"position":"保育员","count":2}]}}}"""
      .replaceAll("\n\\s*", "")
    assert(viols(ok) == Nil)
  }

  test("two-level nesting: array-of-string inside object items") {
    // certificate_requirements: array of {position, certificates: [string]}
    val bad = """{"manager_specific_info":{"recruitment_training":{
      "certificate_requirements":[{"position":"p","certificates":["c",1]}]}}}"""
      .replaceAll("\n\\s*", "")
    assert(viols(bad) == Seq(
      "items:manager_specific_info.recruitment_training.certificate_requirements"))
    val ok = """{"manager_specific_info":{"recruitment_training":{
      "certificate_requirements":[{"position":"p","certificates":["c"]}]}}}"""
      .replaceAll("\n\\s*", "")
    assert(viols(ok) == Nil)
  }

  test("enum gating: a wrongly-typed value reports type:, never both") {
    assert(viols("""{"personal_info":{"gender":7,"education":"硕士","major":"m"}}""")
      == Seq("type:personal_info.gender"))
    assert(viols("""{"personal_info":{"gender":"x","education":"硕士","major":"m"}}""")
      == Seq("enum:personal_info.gender"))
  }

  test("maxItems and items-enum fire independently") {
    val inst = """"institution_info":{"name":"n","city":"c","subject_type":"公办",
      "specific_form":"其他","is_puhui":true,"service_modes":["夜托"],
      "total_capacity":10,"current_enrollment":5,"staff_count":3}"""
      .replaceAll("\n\\s*", "")
    val emp = """"employment_info":{"current_position":"保育员",
      "job_change_interval":"i","salary_range":"s",
      "is_kindergarten_transition":false,
      "job_change_reasons":["a","b","c","d"]}""".replaceAll("\n\\s*", "")
    assert(viols(s"{$inst,$emp}") == Seq(
      "items:institution_info.service_modes",
      "maxItems:employment_info.job_change_reasons"))
  }

  test("malformed payloads and non-object roots are data, not exceptions") {
    // a garbled row must yield an in-band violation, never a job failure
    assert(viols("not json at all {") == Seq("malformed:$"))
    assert(viols("") == Seq("malformed:$"))
    val withNull = Seq[(Long, String)]((1L, null), (2L, "{}"))
      .toDF("id", "j")
    val got = SchemaValidate.validate(withNull, col("j"),
        SchemaValidate.surveySchema)
      .select("id", "violations").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("malformed:$") && got(2L) == Nil)
    // parseable but non-object root: the root type check fires (without
    // it every property check is parent-gated off and arrays pass clean)
    assert(viols("[1,2]") == Seq("type:$"))
    assert(viols("\"hello\"") == Seq("type:$"))
    assert(viols("null") == Seq("type:$")) // JSON null root is VOID, not absent
  }

  test("maxItems enforced at items-subschema depth, not just property positions") {
    // synthetic schema: items-of-objects whose nested array has maxItems
    val s = SchemaValidate.parseSchema(
      """{"type":"object","properties":{"rows":{"type":"array","items":{
        "type":"object","properties":{"tags":{"type":"array","maxItems":2}}}}}}""")
    def v(json: String): Seq[String] = {
      val df = Seq(json).toDF("j")
      SchemaValidate.validate(df, col("j"), s)
        .select("violations").as[Seq[String]].head()
    }
    assert(v("""{"rows":[{"tags":["a","b"]}]}""") == Nil)
    assert(v("""{"rows":[{"tags":["a","b","c"]}]}""") == Seq("items:rows"))
    // the DuckDB rendering carries the same nested check
    assert(SchemaValidate.violationsListSql("j", s)
      .contains("json_array_length(x0, '$.tags') > 2"))
  }

  test("extended keywords: pattern, min/maxItems, bounds, lengths") {
    val s = SchemaValidate.parseSchema(
      """{"type":"object","required":["sku","qty"],"properties":{
        "sku":{"type":"string","pattern":"^[A-Z]{3}-[0-9]+$"},
        "qty":{"type":"integer","minimum":1,"maximum":100},
        "tags":{"type":"array","minItems":1,"maxItems":3,
          "items":{"type":"string","minLength":2,"maxLength":8}},
        "note":{"type":"string","minLength":3,"maxLength":6}}}""")
    def v(json: String): Seq[String] = {
      val df = Seq(json).toDF("j")
      SchemaValidate.validate(df, col("j"), s)
        .select("violations").as[Seq[String]].head()
    }
    assert(v("""{"sku":"ABC-1","qty":50,"tags":["aa"],"note":"hey"}""") == Nil)
    assert(v("""{"sku":"zzz","qty":50}""") == Seq("pattern:sku"))
    assert(v("""{"sku":"ABC-1","qty":0}""") == Seq("minimum:qty"))
    assert(v("""{"sku":"ABC-1","qty":101}""") == Seq("maximum:qty"))
    // inclusive bounds: the boundary values pass
    assert(v("""{"sku":"ABC-1","qty":1}""") == Nil)
    assert(v("""{"sku":"ABC-1","qty":100}""") == Nil)
    assert(v("""{"sku":"ABC-1","qty":50,"tags":[]}""") == Seq("minItems:tags"))
    assert(v("""{"sku":"ABC-1","qty":50,"tags":["a","b","c","d"]}""") ==
      Seq("items:tags", "maxItems:tags")) // over-long AND under-length items
    assert(v("""{"sku":"ABC-1","qty":50,"tags":["toolongtagvalue"]}""") ==
      Seq("items:tags")) // element maxLength, via the items aggregate
    assert(v("""{"sku":"ABC-1","qty":50,"note":"hi"}""") == Seq("minLength:note"))
    assert(v("""{"sku":"ABC-1","qty":50,"note":"toolong"}""") == Seq("maxLength:note"))
    // a wrongly-typed value reports type:, never a bounds/pattern label
    assert(v("""{"sku":7,"qty":"9"}""") == Seq("type:qty", "type:sku"))
    // the generated DuckDB rendering carries every keyword
    val sql = SchemaValidate.violationsListSql("j", s)
    Seq("pattern:sku", "minimum:qty", "maximum:qty", "minItems:tags",
      "maxItems:tags", "minLength:note", "maxLength:note")
      .foreach(l => assert(sql.contains(s"'$l'"), l))
  }

  test("unsupported keywords reject at parse time; required gates on object elements") {
    // a keyword that parses but never enforces would silently admit
    // violating rows — fail fast instead
    val e = intercept[IllegalArgumentException] {
      SchemaValidate.parseSchema(
        """{"type":"object","properties":{"q":{"type":"integer","exclusiveMinimum":0}}}""")
    }
    assert(e.getMessage.contains("exclusiveMinimum"))
    // annotation keys are fine
    SchemaValidate.parseSchema(
      """{"$schema":"x","title":"t","description":"d","type":"object"}""")
    // draft-07: required only constrains OBJECT instances — a scalar
    // array element is not obligated to carry properties
    val s = SchemaValidate.parseSchema(
      """{"type":"object","properties":{"rows":{"type":"array",
        "items":{"required":["id"]}}}}""")
    def v(json: String): Seq[String] = {
      val df = Seq(json).toDF("j")
      SchemaValidate.validate(df, col("j"), s)
        .select("violations").as[Seq[String]].head()
    }
    assert(v("""{"rows":["scalar"]}""") == Nil)
    assert(v("""{"rows":[{"id":1}]}""") == Nil)
    assert(v("""{"rows":[{"other":1}]}""") == Seq("items:rows"))
    // the SQL rendering carries the same object gate
    assert(SchemaValidate.violationsListSql("j", s)
      .contains("json_type(x0) = 'OBJECT' AND json_type(x0, '$.id') IS NULL"))
  }

  test("golden: the reference's own survey payloads against its own schema") {
    def fileViols(path: String): Seq[String] = {
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      viols(json)
    }
    // the canonical payload the reference tests with conforms in full
    assert(fileViols("/root/reference/test_survey_data.json") == Nil)
    // ... and its truncated 副本 drops everything in institution_info
    // but the name — exactly the 8 remaining required fields
    assert(fileViols("/root/reference/data/test_survey_data - 副本.json") ==
      Seq("missing:institution_info.city",
        "missing:institution_info.current_enrollment",
        "missing:institution_info.is_puhui",
        "missing:institution_info.service_modes",
        "missing:institution_info.specific_form",
        "missing:institution_info.staff_count",
        "missing:institution_info.subject_type",
        "missing:institution_info.total_capacity"))
  }

  test("reserved output columns fail fast") {
    val df = Seq(("{}", true)).toDF("j", "is_valid")
    assertThrows[IllegalArgumentException] {
      SchemaValidate.validate(df, col("j"), SchemaValidate.surveySchema)
    }
  }

  test("generated DuckDB rendering stays in sync with the model") {
    // not a DuckDB run (tests are Spark-side) — pin the structural
    // properties the oracle relies on: one CASE per compiled check and
    // the same label set the Spark side emits
    val sql = SchemaValidate.violationsListSql("j", SchemaValidate.surveySchema)
    assert(sql.startsWith("list_sort(list_filter(["))
    Seq("missing:institution_info.name", "enum:personal_info.education",
      "maxItems:employment_info.job_change_reasons",
      "items:manager_specific_info.recruitment_training.shortage_positions")
      .foreach(l => assert(sql.contains(s"'$l'"), l))
  }
}
