package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format date parsing and relative-date arithmetic — the Spark
  * restatement of 多数据源获取链接.py:29-95 (5 literal formats + "N 天/周/月/年前"
  * relative expressions) and retrieve.py:1280-1351 (record-date extraction
  * with ranges and bare years). SURVEY.md §2.8 F3/F4/F5.
  */
object DateFunctions {

  /** The five literal formats the reference recognizes (LINKS:40-46). */
  val Formats: Seq[String] =
    Seq("yyyy-MM-dd", "yyyy/MM/dd", "yyyy.MM.dd", "yyyy年MM月dd日", "yyyyMMdd")

  /** First format that parses wins; null when none do.
    *
    * Implemented as a shape dispatch rather than try-all-five: each format
    * has a disjoint separator signature (`-`, `/`, `.`, `年`, bare digits),
    * so ONE parser attempt runs per row instead of up to five — equivalent
    * to the reference's try-in-order loop (a string containing `-` can only
    * ever match the `-` format) but ~5× cheaper on the 100 TB hot path.
    */
  def parseMultiFormat(c: Column): Column =
    when(c.contains("-"), try_to_date(c, "yyyy-MM-dd"))
      .when(c.contains("/"), try_to_date(c, "yyyy/MM/dd"))
      .when(c.contains("."), try_to_date(c, "yyyy.MM.dd"))
      .when(c.contains("年"), try_to_date(c, "yyyy年MM月dd日"))
      .when(c.rlike("^\\d{8}$"), try_to_date(c, "yyyyMMdd"))

  /** Bare-year fallback: "2023" → 2023-01-01 (retrieve.py:1311-1318). */
  def parseWithYearFallback(c: Column): Column =
    coalesce(
      parseMultiFormat(c),
      when(c.rlike("^\\s*\\d{4}\\s*$"),
        make_date(trim(c).cast("int"), lit(1), lit(1))))

  /** Relative expressions "N天前 / N周前 / N月前 / N年前" resolved against an
    * explicit anchor (LINKS:61-95; month=30d, year=365d per the reference).
    * Anchor is a parameter, not current_date(), so results are deterministic.
    */
  def parseRelative(c: Column, anchor: Column): Column = {
    val n = regexp_extract(c, "^(\\d+)\\s*(天|日|周|月|年)前$", 1)
    val unit = regexp_extract(c, "^(\\d+)\\s*(天|日|周|月|年)前$", 2)
    val days = when(unit === "天" || unit === "日", n.cast("int"))
      .when(unit === "周", n.cast("int") * 7)
      .when(unit === "月", n.cast("int") * 30)
      .when(unit === "年", n.cast("int") * 365)
    when(n =!= "", date_sub(anchor, days))
  }

  /** Full reference chain: literal formats, bare year, relative-to-anchor. */
  def parseAny(c: Column, anchor: Column): Column =
    coalesce(parseWithYearFallback(c), parseRelative(c, anchor))

  /** Range "A - B" → struct(start,end); single date → both ends equal
    * (retrieve.py:1280-1307).
    */
  def parseRange(c: Column): Column = {
    val isRange = c.rlike("\\s+-\\s+|\\s*~\\s*")
    val parts = split(c, "\\s+-\\s+|\\s*~\\s*", 2)
    struct(
      when(isRange, parseWithYearFallback(element_at(parts, 1)))
        .otherwise(parseWithYearFallback(c)).as("start"),
      when(isRange, parseWithYearFallback(element_at(parts, 2)))
        .otherwise(parseWithYearFallback(c)).as("end"))
  }

  /** Time-range predicate with the reference's missing-date-rejects rule
    * (retrieve.py:1329-1351 — P9): null record date fails when a filter is set.
    */
  def inRange(d: Column, start: Column, end: Column): Column =
    d.isNotNull && d.between(start, end)

  /** Seconds → "MM:SS", truncating fractional seconds (Python int()
    * semantics, dify_transformation.py:93-103 — F5).
    */
  def mmss(seconds: Column): Column =
    format_string("%02d:%02d",
      floor(seconds / 60).cast("int"), floor(seconds % 60).cast("int"))
}
