package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J2/X10 — the survey transformation surface: code→label mapping driven by
  * a form-config dimension (transform_survey_data.py:5-101) and the
  * survey→Markdown report generator (format_survey_for_rag.py:173-401).
  *
  * Label dimensions are plain DataFrames (broadcastable at any scale):
  *   options(field_key, code, label)            — single/multi-select
  *   matrix(field_key, row_code, row_label, col_code, col_label)
  * Unmapped codes PASS THROUGH unchanged (the reference's fallback —
  * `test_output.json`'s `unknown_field` case).
  */
object SurveyTransform {

  /** Map a scalar code column through the options dim for `fieldKey`;
    * fallback to the raw code. Broadcast hash join, null-safe.
    */
  def mapCode(df: DataFrame, codeCol: String, fieldKey: String,
      options: DataFrame, out: String): DataFrame = {
    val dim = broadcast(options
      .filter(col("field_key") === fieldKey)
      .select(col("code").as(s"__c_$out"), col("label").as(s"__l_$out")))
    df.join(dim, col(codeCol) === col(s"__c_$out"), "left")
      .withColumn(out, coalesce(col(s"__l_$out"), col(codeCol)))
      .drop(s"__c_$out", s"__l_$out")
  }

  /** Element-wise label mapping for an array column (service_modes etc.):
    * the dim becomes a map literal via collect on the driver — dims are
    * form-config sized (hundreds of rows), never data-sized.
    */
  def mapCodeArray(df: DataFrame, arrCol: String, fieldKey: String,
      options: DataFrame, out: String): DataFrame = {
    val m = optionsMap(options, fieldKey)
    df.withColumn(out, transform(col(arrCol),
      c => coalesce(element_at(m, c), c)))
  }

  /** Matrix answers `{row_code: col_code}` → `{row_label: col_label}`
    * (XFORM:90-99): both key and value mapped, unmapped pass through.
    */
  def mapMatrix(df: DataFrame, mapCol: String, fieldKey: String,
      matrix: DataFrame, out: String): DataFrame = {
    val rows = matrixMap(matrix, fieldKey, "row_code", "row_label")
    val cols = matrixMap(matrix, fieldKey, "col_code", "col_label")
    df.withColumn(out,
      map_from_entries(transform(map_entries(col(mapCol)),
        e => struct(
          coalesce(element_at(rows, e.getField("key")), e.getField("key")).as("key"),
          coalesce(element_at(cols, e.getField("value")), e.getField("value")).as("value")))))
  }

  /** Matrix variant taking separate row/col dims (the FormConfig.parse
    * output shape): both axes mapped, unmapped codes pass through.
    */
  def mapMatrixDims(df: DataFrame, mapCol: String,
      rowDim: Map[String, String], colDim: Map[String, String], out: String): DataFrame = {
    val rows = typedLit(rowDim)
    val cols = typedLit(colDim)
    df.withColumn(out,
      map_from_entries(transform(map_entries(col(mapCol)),
        e => struct(
          coalesce(element_at(rows, e.getField("key")), e.getField("key")).as("key"),
          coalesce(element_at(cols, e.getField("value")), e.getField("value")).as("value")))))
  }

  private def optionsMap(options: DataFrame, fieldKey: String): Column = {
    val pairs = options.filter(col("field_key") === fieldKey)
      .select("code", "label").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    typedLit(pairs)
  }

  private def matrixMap(matrix: DataFrame, fieldKey: String,
      codeField: String, labelField: String): Column = {
    val pairs = matrix.filter(col("field_key") === fieldKey)
      .select(codeField, labelField).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap.toSeq.toMap
    typedLit(pairs)
  }

  /** Boolean → 是/否 (RAGFMT:125-127 — F12). */
  def boolLabel(c: Column): Column =
    when(c.isNull, lit("未知")).when(c, lit("是")).otherwise(lit("否"))

  /** X10 — survey record → Markdown report section (the RAGFMT:173-401
    * composition): pure `format_string`/`concat_ws` so report generation
    * is distributed and codegen'd, one row per record.
    */
  def institutionReport(
      name: Column, city: Column, subjectType: Column, isPuhui: Column,
      serviceModes: Column, totalCapacity: Column, currentEnrollment: Column): Column = {
    // null-guard every field: concat/format_string propagate null, which
    // would otherwise null the ENTIRE report for one missing answer
    def str(c: Column) = coalesce(c.cast("string"), lit("未知"))
    def num(c: Column) = coalesce(concat(c.cast("string"), lit("人")), lit("未知"))
    concat(
      lit("# 机构调研报告\n\n"),
      format_string("## %s（%s）\n\n", str(name), str(city)),
      lit("| 项目 | 值 |\n| --- | --- |\n"),
      format_string("| 办学性质 | %s |\n", str(subjectType)),
      format_string("| 是否普惠 | %s |\n", boolLabel(isPuhui)),
      format_string("| 服务模式 | %s |\n",
        coalesce(array_join(serviceModes, "、"), lit("未知"))),
      format_string("| 核定规模 | %s |\n", num(totalCapacity)),
      format_string("| 在托人数 | %s |\n", num(currentEnrollment)),
      lit("\n"),
      when(currentEnrollment > totalCapacity, lit("> 注意：在托人数超出核定规模\n"))
        .otherwise(lit("")))
  }
}
