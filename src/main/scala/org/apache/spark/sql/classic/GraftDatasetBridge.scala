package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the package-private `Dataset.ofRows` — the established pattern
  * for libraries that surface custom LogicalPlan nodes as DataFrames (the
  * same seam Delta Lake and Sedona use). Kept to this single call site;
  * everything else in the engine lives under `graft.*` and uses only the
  * public API.
  */
object GraftDatasetBridge {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}

/** Bridge to the package-private Column ⇄ Expression converters — lets a
  * compiled kernel expression become a Column WITHOUT the per-call
  * SparkSession.active + functionRegistry round trip (and without a
  * session at all: hot-path Column builders like `TextFunctions.tokens`
  * have no session in scope). Same seam `functions._` itself uses.
  */
object GraftColumnBridge {
  def column(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
