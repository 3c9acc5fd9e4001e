package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of join — for every left row, the single right row with the
  * greatest `rightTime <= leftTime` (backward) or smallest
  * `rightTime >= leftTime` (forward) within the same key. The reference has
  * no as-of shape (SURVEY §2.3); this is an engine extension for
  * event-to-snapshot enrichment (e.g. "state of the user at order time").
  *
  * Implementation is the scale-correct union form, NOT a range join: tag
  * both sides, union, and resolve with one window pass —
  * `last(payload, ignoreNulls)` over the time-ordered prefix. One shuffle
  * on the key, one sort, zero row multiplication; a range join would
  * produce |left| × |matching right| intermediates before its top-1 filter.
  * Hot keys are bounded by the window sort, the same posture as every other
  * windowed operator here (salt the key upstream if one key dominates).
  */
object AsofJoin {

  /** @param rightPayload (outputName, column-on-right) pairs carried to the
    *                     matched left row (null when no match — left-outer).
    * @param rightTiebreak orders right rows sharing an identical timestamp;
    *                      the LAST one in this order wins (backward) / the
    *                      FIRST one wins (forward), making ties
    *                      deterministic.
    */
  def backward(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)], rightTiebreak: Column): DataFrame =
    asof(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, rightTiebreak, forward = false)

  def forward(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)], rightTiebreak: Column): DataFrame =
    asof(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, rightTiebreak, forward = true)

  private def asof(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)], rightTiebreak: Column,
      forward: Boolean): DataFrame = {
    val payloadCols = rightPayload.map { case (n, c) => c.as(n) }
    val payloadType = right.select(payloadCols: _*).schema
    val leftRowType = left.schema

    val rightSide = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
      rightTiebreak.cast("long").as("__tb"),
      struct(payloadCols: _*).as("__p"),
      lit(null).cast(leftRowType).as("__row"))
    val leftSide = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side"),
      lit(0L).as("__tb"),
      lit(null).cast(payloadType).as("__p"),
      struct(left.columns.map(col): _*).as("__row"))

    // Backward: at equal time, right rows sort BEFORE left (`side` asc), so
    // a right row at exactly leftTime is eligible (>= / <= inclusive
    // semantics); among equal-time right rows the tiebreak-max wins via
    // `last`. Forward mirrors both.
    val resolved = if (!forward) {
      val w = Window.partitionBy(col("__k"))
        .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      rightSide.unionByName(leftSide)
        .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
    } else {
      val w = Window.partitionBy(col("__k"))
        .orderBy(col("__t").asc, col("__side").desc, col("__tb").asc)
        .rowsBetween(0, Window.unboundedFollowing)
      rightSide.unionByName(leftSide)
        .withColumn("__asof", first(col("__p"), ignoreNulls = true).over(w))
    }
    val out = resolved.filter(col("__side") === 1)
    out.select(
      left.columns.map(c => col(s"__row.$c")) ++
        rightPayload.map { case (n, _) => col(s"__asof.$n").as(n) }: _*)
  }

  /** Backward as-of via the custom whole-operator plan
    * (`graft.plans.AsofMergeJoin`): LogicalPlan + Strategy + BinaryExecNode
    * with a streaming per-partition merge — the physical-operator form of
    * `backward` (which stays the composable specification; the two are
    * equivalence-tested and q75 oracle-checks this one).
    *
    * Columns are named (resolved against each side); the output carries
    * EVERY left column plus every right column (null when unmatched) —
    * pre-select/rename the right side to avoid name clashes.
    */
  def backwardMerge(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightTiebreak: Option[String] = None): DataFrame =
    merge(left, right, leftKeys, rightKeys, leftTsCol, rightTsCol,
      rightTiebreak, forward = false)

  /** Forward as-of (earliest right row with rightTs >= leftTs) through the
    * same custom exec; ties on rightTs resolve to the FIRST row in
    * `rightTiebreak` order, mirroring `forward`.
    */
  def forwardMerge(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightTiebreak: Option[String] = None): DataFrame =
    merge(left, right, leftKeys, rightKeys, leftTsCol, rightTsCol,
      rightTiebreak, forward = true)

  private def merge(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightTiebreak: Option[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    graft.plans.AsofMergePlans.ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // Self-joins reuse attribute ids; re-aliasing every right column mints
    // fresh ids so the node's output stays unambiguous.
    val rightSafe =
      if (right.queryExecution.analyzed.outputSet
          .intersect(lPlan.outputSet).nonEmpty)
        right.select(right.columns.map(c => col(c).as(c)): _*)
      else right
    val rPlan = rightSafe.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def resolve(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    val node = graft.plans.AsofMergeJoin(
      lPlan, rPlan,
      leftKeys.map(resolve(lPlan, _)), rightKeys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTsCol), resolve(rPlan, rightTsCol),
      rightTiebreak.map(resolve(rPlan, _)), forward)
    org.apache.spark.sql.classic.GraftDatasetBridge.ofRows(spark, node)
  }
}
