package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record surface (FIXTURES.md §1/§2) + the auto_parse record-type
  * dispatch (X1, retrieve.py:976-986): KV maps are sniffed by marker keys —
  * `学校标识码` → school-major record, `统一社会信用代码` → institution
  * record, otherwise survey — and projected into case-class Datasets.
  */
object Records {

  case class InstitutionRecord(
      name: String, alias: String, credit_code: String,
      institution_type: String, address: String,
      registration_time: Timestamp, region_code: String)

  case class MoeMajorRecord(
      school_name: String, province: String, school_code: String,
      major_name: String, major_code: String,
      duration_years: Option[Int], year: Option[Int], note: String)

  /** X1 dispatch column over a kv map (marker-key sniffing). */
  def recordType(kv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(element_at(kv, "学校标识码").isNotNull, "school_major")
      .when(element_at(kv, "统一社会信用代码").isNotNull, "institution")
      .otherwise("survey")

  /** Institution records from KV-block files (retrieve.py:909-934 typed). */
  def institutions(spark: SparkSession, path: String): Dataset[InstitutionRecord] = {
    import spark.implicits._
    KvBlock.read(spark, path)
      .filter(recordType(col("kv")) === "institution")
      .select(
        KvBlock.field(col("kv"), "机构名称").as("name"),
        KvBlock.field(col("kv"), "别名").as("alias"),
        KvBlock.field(col("kv"), "统一社会信用代码").as("credit_code"),
        KvBlock.field(col("kv"), "机构类型").as("institution_type"),
        KvBlock.field(col("kv"), "详细地址").as("address"),
        coalesce(
          try_to_timestamp(KvBlock.field(col("kv"), "备案及完成时间"),
            lit("yyyy-MM-dd HH:mm:ss")),
          try_to_timestamp(KvBlock.field(col("kv"), "备案及完成时间"),
            lit("yyyy-MM-dd"))).as("registration_time"),
        KvBlock.field(col("kv"), "区域编号").as("region_code"))
      .as[InstitutionRecord]
  }

  /** MOE school-major records with `专业名 (code)` split (retrieve.py:936-974). */
  def moeMajors(spark: SparkSession, path: String): Dataset[MoeMajorRecord] = {
    import spark.implicits._
    val major = KvBlock.field(col("kv"), "开设专业")
    // no "(code)" suffix → whole string is the name, code empty (the
    // reference's split, not silent data loss)
    val hasCode = major.rlike("^(.*?)\\s*\\((.*?)\\)\\s*$")
    KvBlock.read(spark, path)
      .filter(recordType(col("kv")) === "school_major")
      .select(
        KvBlock.field(col("kv"), "机构名称").as("school_name"),
        KvBlock.field(col("kv"), "省份").as("province"),
        KvBlock.field(col("kv"), "学校标识码").as("school_code"),
        when(hasCode, regexp_extract(major, "^(.*?)\\s*\\((.*?)\\)\\s*$", 1))
          .otherwise(trim(major)).as("major_name"),
        regexp_extract(major, "^(.*?)\\s*\\((.*?)\\)\\s*$", 2).as("major_code"),
        KvBlock.field(col("kv"), "修业年限").cast("int").as("duration_years"),
        KvBlock.field(col("kv"), "年份").cast("int").as("year"),
        coalesce(KvBlock.field(col("kv"), "备注"), lit("")).as("note"))
      .as[MoeMajorRecord]
  }
}
