package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC snapshot merge — apply a change log (upserts + tombstones) to a
  * base snapshot, latest version wins: the standard "MERGE INTO" shape a
  * corpus pipeline runs when a crawl revisits pages (new revision
  * supersedes, 404/robots-revoked becomes a tombstone) — expressed as
  * plain Spark, no table-format dependency.
  *
  * Scale posture: one union (no shuffle) + one keyed WindowGroupLimit
  * pass (`keepFirst` by version desc — only the winning row per key
  * crosses the exchange under group-limit pushdown). At 100 TB the
  * change log is normally ≪ the snapshot; the exchange is keyed by the
  * merge key, the same partitioning the next merge reuses if the
  * snapshot is written bucketed by key.
  */
object ChangeLog {

  /** @param base     current snapshot; one live row per key.
    * @param changes  change log: base's data columns PLUS `versionCol`
    *                 (numeric, > 0, unique per key by contract) and
    *                 `deleteCol` (boolean tombstone marker).
    * @param keys     merge key column names.
    * Returns the next snapshot: base schema, one row per surviving key.
    * Base rows carry implicit version 0; the highest version per key wins;
    * a winning tombstone removes the key.
    */
  def applyChangeLog(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String, deleteCol: String): DataFrame = {
    val dataCols = base.columns
    require(keys.forall(dataCols.contains), "keys must be base columns")
    val b = base.withColumn("__v", lit(0L)).withColumn("__del", lit(false))
    val c = changes
      .withColumn("__v", col(versionCol).cast("long"))
      .withColumn("__del", coalesce(col(deleteCol), lit(false)))
      .drop(versionCol, deleteCol)
      .select(dataCols.map(col) :+ col("__v") :+ col("__del"): _*)
    val merged = Ranking.keepFirst(
      b.unionByName(c), keys.map(col), Seq(col("__v").desc))
    merged.filter(!col("__del")).drop("__v", "__del")
  }
}
