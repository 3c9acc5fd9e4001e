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
