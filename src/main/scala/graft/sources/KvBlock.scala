package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KV-block text format — the reference's record interchange format
  * (SURVEY.md §2.1 S1/S14): lines of `键：值` (full-width colon), multiple
  * records per file joined by `^_^` (moe_majors_scraper.py:149-171,
  * retrieve.py:909-974).
  *
  * Reader: wholeTextFiles-free — `spark.read.text(wholetext=false)` would
  * split records across lines, so we read whole files, explode on the block
  * delimiter, then parse each block's lines into a map. All expression-level
  * (split/explode/map_from_entries), no UDF.
  *
  * Writer: partitioned text sink, one directory per (partition cols), blocks
  * re-joined with the delimiter — the S14 layout
  * (`data/moe_majors_split/moe_majors_<province>_<year>.txt` analog).
  */
object KvBlock {

  val BlockDelimiter = "\\^_\\^"

  /** Read files under `path` into one row per KV block, with a
    * `kv: map<string,string>` column. Splits on the first full- or
    * half-width colon per line (retrieve.py:917-922).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    ensureLastWin(spark)
    val raw = spark.read.option("wholetext", "true").text(path)
    blocksFromText(raw, col("value")).select(col("block"), parseBlock(col("block")).as("kv"))
  }

  /** Read a PARTITIONED KV sink (writePartitioned output) back: one row
    * per block, with the partition-directory columns (e.g. `lang=de`)
    * preserved alongside `block` and the parsed `kv` map — the inverse of
    * `writePartitioned`, so sink layouts are queryable (q83).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame = {
    ensureLastWin(spark)
    val raw = spark.read.option("wholetext", "true").text(path)
    val partCols = raw.columns.filterNot(_ == "value").map(col)
    raw.select(partCols :+ explode(split(col("value"), BlockDelimiter)).as("block"): _*)
      .withColumn("block", regexp_replace(col("block"), "^\\s+|\\s+$", ""))
      .filter(length(col("block")) > 0)
      .withColumn("kv", parseBlock(col("block")))
  }

  /** Repeated keys keep the LAST value (Python-dict semantics) — needs the
    * session-level dedup policy; the default EXCEPTION policy would kill a
    * job on one malformed block.
    */
  def ensureLastWin(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")

  /** Explode a whole-file text column into trimmed, non-empty blocks.
    * Spark's `trim` strips spaces ONLY — newline edges around the block
    * delimiter need the regex form.
    */
  def blocksFromText(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, BlockDelimiter)).as("block"))
      .withColumn("block", regexp_replace(col("block"), "^\\s+|\\s+$", ""))
      .filter(length(col("block")) > 0)

  /** `键：值` lines → map<string,string>; first colon wins, both `：` and `:`
    * accepted; lines without a colon are dropped. Repeated keys keep the
    * LAST value under `spark.sql.mapKeyDedupPolicy=LAST_WIN` (set by
    * GraftSession / ensureLastWin — an expression-level O(n²) dedup here
    * measured 4× slower over the 62.7k-record corpus).
    */
  def parseBlock(block: Column): Column =
    map_from_entries(transform(
      filter(split(block, "\n"), l => l.rlike("[：:]")),
      l => struct(
        trim(regexp_extract(l, "^([^：:]*)[：:]", 1)).as("key"),
        trim(regexp_replace(l, "^[^：:]*[：:]", "")).as("value"))))

  /** Project typed columns out of the kv map with null-safe defaults (the
    * reference's dict.get(k, '') lookups).
    */
  def field(kv: Column, key: String): Column = element_at(kv, key)

  /** Render rows back to KV blocks: one line per (key, value), in the given
    * key order — the inverse of parseBlock, used by the partitioned sink.
    * Values are sanitized (newlines and the `^_^` record delimiter collapse
    * to a space) so a hostile value can't split its record, inject extra
    * KV lines, or terminate the block early — the round trip
    * parseBlock(renderBlock(kv)) is total, not just for well-formed input.
    */
  def renderBlock(kvPairs: Seq[(String, Column)]): Column =
    concat_ws("\n", kvPairs.map { case (k, v) =>
      concat(lit(k), lit("："), regexp_replace(v, "\\r?\\n|\\r|\\^_\\^", " "))
    }: _*)

  /** S14 sink: blocks written under one directory per partition value,
    * each record terminated by the `^_^` delimiter so any concatenation of
    * part files is a valid KV-block file (the reader drops the empty
    * trailing chunk).
    *
    * Deliberately NOT a collect_list-per-partition-value single file: a hot
    * partition holding millions of records must stream through many tasks,
    * never materialize as one row (measured: the single-row variant fell
    * over at ~6M records in one province). `repartition` on the partition
    * columns keeps file counts low; remove it if partition values are few
    * and huge (then tasks shard each value instead).
    */
  def writePartitioned(
      df: DataFrame, blockCol: Column, partitionCols: Seq[String], outPath: String,
      coalescePartitions: Boolean = true): Unit = {
    val rows = df.select((partitionCols.map(col) :+
      concat(blockCol, lit("\n^_^")).as("value")): _*)
    val arranged =
      if (coalescePartitions) rows.repartition(partitionCols.map(col): _*) else rows
    arranged.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .text(outPath)
  }
}
