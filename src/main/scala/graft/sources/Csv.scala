package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S3 — CSV scan with dialect sniffing and the reference's 500-row cap +
  * truncation marker (多数据源获取数据.py:959-977, O5).
  *
  * Sniffing reads ONE line from the file head (driver-side, O(1) — not a
  * scan) and picks the delimiter with the most columns, mirroring the
  * csv.Sniffer behavior the reference relies on.
  */
object Csv {

  val Candidates: Seq[Char] = Seq(',', ';', '\t', '|')

  /** Caps at or below this bound run the reference's single-job
    * `head(cap+1)` contract (bounded driver materialization, one scan);
    * larger caps stay fully distributed.
    */
  val DriverCapMax: Int = 500

  /** Pick the delimiter yielding the most fields on the sample line. */
  def sniffDelimiter(sampleLine: String): Char =
    Candidates.maxBy(d => sampleLine.split(java.util.regex.Pattern.quote(d.toString), -1).length)

  def sniffFile(spark: SparkSession, path: String): Char = {
    val head = spark.read.text(path).limit(1).head().getString(0)
    sniffDelimiter(head)
  }

  /** Read with sniffed dialect, capped at `cap` rows; when the cap
    * truncates, a marker row (first column annotated) is appended — the
    * reference's "表格过大仅显示前N行" convention.
    *
    * Pass `schema` when the caller knows it — `inferSchema` costs an extra
    * full scan of the file.
    *
    * Scale posture: at the reference's cap (≤ [[DriverCapMax]]) one
    * `head(cap+1)` job decides both the kept rows and the truncation flag —
    * bounded by construction. Above that bound the plan stays distributed:
    * ONE cached `limit(cap+1)` prefix feeds both the truncation count and
    * the emitted rows, so the flag and the rows always agree even when the
    * source's unordered limit would pick different splits across jobs, and
    * no data row ever passes through the driver.
    */
  def read(spark: SparkSession, path: String, cap: Int = 500,
      schema: Option[StructType] = None): DataFrame = {
    val delim = sniffFile(spark, path)
    val reader = spark.read
      .option("header", "true")
      .option("sep", delim.toString)
    val df = schema match {
      case Some(sch) => reader.schema(sch).csv(path)
      case None => reader.option("inferSchema", "true").csv(path)
    }
    if (cap <= DriverCapMax) {
      // one head(cap+1) job decides both the kept rows and the truncation
      // flag (limit+count would re-scan)
      val headRows = df.head(cap + 1)
      val capped = spark.createDataFrame(
        java.util.Arrays.asList(headRows.take(cap): _*), df.schema)
      if (headRows.length > cap) withMarker(capped, df.schema, cap) else capped
    } else {
      // one distributed pass: cache the cap+1 prefix, then derive BOTH the
      // flag and the kept rows from it — two independent limit jobs could
      // select different row prefixes on sources with unstable split order
      val prefix = df.limit(cap + 1).cache()
      val truncated = prefix.count() > cap
      val capped = prefix.limit(cap)
      if (truncated) withMarker(capped, df.schema, cap) else capped
    }
  }

  /** Append the one-row truncation marker (first column annotated — and
    * therefore forced to string, as the reference renders it).
    */
  private def withMarker(capped: DataFrame, schema: StructType, cap: Int): DataFrame = {
    val firstCol = schema.head.name
    val marker = capped.sparkSession.range(1).select(schema.map { f =>
      if (f.name == firstCol) lit(s"...[truncated to $cap rows]").as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    capped.withColumn(firstCol, col(firstCol).cast("string")).unionByName(marker)
  }
}
