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

  /** Slowly-changing-dimension Type-2 history from a change stream: each
    * row becomes a version interval `[effective_from, effective_to)` —
    * effective_to is the NEXT version's timestamp (null and
    * `is_current = true` for the latest) — the standard temporal-dimension
    * build downstream of [[applyChangeLog]]'s latest-wins snapshot when
    * the full history must stay queryable (as-of joins against it via
    * plans.AsofMergeJoin).
    *
    * `orderBy.head` must be the version timestamp; pass extra tiebreak
    * columns (a change-log sequence id) when timestamps can collide —
    * without one, colliding versions order nondeterministically and the
    * interval bounds are not reproducible.
    *
    * Scale posture: ONE keyed exchange + in-partition sort (a single
    * window pass; lead(1) carries no frame buffer). The output is
    * partitioned by `keys` — writing it bucketed by the same keys makes
    * the subsequent as-of join exchange-free.
    */
  def scd2(changes: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    require(orderBy.nonEmpty, "orderBy must start with the version timestamp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(orderBy: _*)
    changes
      .withColumn("effective_from", orderBy.head)
      .withColumn("effective_to", lead(orderBy.head, 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
