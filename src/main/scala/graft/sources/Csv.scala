package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 — CSV scan with dialect sniffing and the reference's 500-row cap +
  * truncation marker (多数据源获取数据.py:959-977, O5).
  *
  * Sniffing reads ONE line from the file head (driver-side, O(1) — not a
  * scan) and picks the delimiter with the most columns, mirroring the
  * csv.Sniffer behavior the reference relies on.
  */
object Csv {

  val Candidates: Seq[Char] = Seq(',', ';', '\t', '|')

  /** Pick the delimiter yielding the most fields on the sample line. */
  def sniffDelimiter(sampleLine: String): Char =
    Candidates.maxBy(d => sampleLine.split(java.util.regex.Pattern.quote(d.toString), -1).length)

  def sniffFile(spark: SparkSession, path: String): Char = {
    val head = spark.read.text(path).head().getString(0)
    sniffDelimiter(head)
  }

  /** Read with sniffed dialect, inferred schema, capped at `cap` rows; when
    * the cap truncates, a marker row (first column annotated) is appended —
    * the reference's "表格过大仅显示前N行" convention.
    */
  def read(spark: SparkSession, path: String, cap: Int = 500): DataFrame = {
    val delim = sniffFile(spark, path)
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("sep", delim.toString)
      .csv(path)
    // one head(cap+1) job decides both the kept rows and the truncation
    // flag (limit+count would re-scan)
    val headRows = df.head(cap + 1)
    val capped = spark.createDataFrame(
      java.util.Arrays.asList(headRows.take(cap): _*), df.schema)
    if (headRows.length > cap) {
      val firstCol = df.columns.head
      // one-row marker with the first column annotated (forces it string)
      val marker = spark.range(1).select(df.columns.map { c =>
        if (c == firstCol) lit(s"...[truncated to $cap rows]").as(c)
        else lit(null).cast(df.schema(c).dataType).as(c)
      }: _*)
      capped.withColumn(firstCol, col(firstCol).cast("string")).unionByName(marker)
    } else capped
  }
}
