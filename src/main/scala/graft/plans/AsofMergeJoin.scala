package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join (SURVEY §2.3 engine extension), expressed the
  * way Spark expresses sort-merge join itself: a custom LogicalPlan node,
  * a planner Strategy, and a physical BinaryExecNode whose distribution /
  * ordering REQUIREMENTS let EnsureRequirements plan the shuffles and
  * sorts — the engine never hand-schedules them.
  *
  * Semantics (backward as-of, left outer): for every left row, the right
  * row of the same key with the greatest rightTs <= leftTs; ties on
  * rightTs resolved to the last row in `rightTiebreak` order. Rows with a
  * null key or null timestamp never match (SQL equality-join semantics);
  * unmatched left rows keep null right columns.
  *
  * Scale: one hash shuffle per side (co-clustered on the join keys), one
  * sort per side, then a single streaming merge pass per partition —
  * O(|L| + |R|) with NO row multiplication, no range explosion, and no
  * union-side struct boxing (the union+window form in operators.AsofJoin
  * carries every left row through the window state; this exec streams).
  * Parallelism is keyed by join-key cardinality, so it grows with data.
  */
case class AsofMergeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTiebreak: Option[Expression],
    forward: Boolean = false) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching key lists")
  // No analyzer coercion runs on this node: mismatched types would hash
  // keys into DIFFERENT partitions (Murmur3 hashInt != hashLong for equal
  // values) and compare right rows with wrong-typed accessors — silently
  // unmatched rows, never an error. Fail construction instead.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types must match exactly: " +
      s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join timestamp types must match exactly: " +
      s"${leftTs.dataType} vs ${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans AsofMergeJoin → AsofMergeJoinExec. Injected via GraftExtensions
  * (spark.sql.extensions) and, belt-and-suspenders, through
  * `spark.experimental.extraStrategies` by the AsofJoin API.
  */
object AsofMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofMergeJoin =>
      AsofMergeJoinExec(j.leftKeys, j.rightKeys, j.leftTs, j.rightTs,
        j.rightTiebreak, j.forward, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Left-only deterministic filters commute with the left-outer as-of join
  * (each left row is processed independently), so push them below the
  * custom node — Catalyst's own PushPredicateThroughJoin does not know
  * this node exists.
  */
object PushFilterThroughAsofMergeJoin
    extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsofMergeJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

case class AsofMergeJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTiebreak: Option[Expression], forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-cluster both sides on the join keys; EnsureRequirements inserts
    * the exchanges (hash-compatible across sides, exactly as for SMJ).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Sort each side by (keys…, ts[, tiebreak]) so the merge is one pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: rightTiebreak.toSeq.map(SortOrder(_, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      // Bind against the NULLABILITY-ADJUSTED right attributes: unmatched
      // left rows substitute an all-null right row, and a non-nullable
      // BoundReference would read raw zeros out of those null slots.
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // Single-row lookahead over the right side. Iterator rows (and the
      // key-projection buffer) are only invalidated by the NEXT call, so
      // the lookahead itself needs no copy — rows skipped in the catch-up
      // loops cost zero allocations. Only a RETAINED match (held across
      // further advances) is copied, at retention time.
      var rCur: InternalRow = null
      var rCurKey: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rCur = rIter.next()
          rCurKey = rKeyProj(rCur)
        } else { rCur = null; rCurKey = null }
      advanceRight()

      // Best match so far for the current key run (right side is sorted,
      // so the last row advanced past with ts <= leftTs is the greatest).
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null

      lIter.map { l =>
        val k = lKeyProj(l)
        val ts = lTsProj(l)
        val lValid = !k.anyNull && !ts.isNullAt(0)
        var matched: InternalRow = null
        if (lValid && !forward) {
          // Backward: consume every right row with ts <= leftTs; the last
          // one consumed for this key is the greatest (right is sorted).
          var go = true
          while (go && rCur != null) {
            val c = keyOrd.compare(rCurKey, k)
            if (c < 0) advanceRight()
            else if (c == 0) {
              val rts = rTsProj(rCur)
              if (rts.isNullAt(0)) advanceRight() // unusable: no timestamp
              else if (tsOrd.compare(rts, ts) <= 0) {
                lastMatch = rCur.copy(); lastKey = rCurKey.copy()
                advanceRight()
              } else go = false
            } else go = false
          }
          if (lastMatch != null && keyOrd.compare(lastKey, k) == 0) matched = lastMatch
        } else if (lValid) {
          // Forward: skip right rows strictly before leftTs — left ts is
          // nondecreasing, so they are dead for every later left row too —
          // then the lookahead row itself is the earliest eligible match.
          // It is NOT consumed: the same row may serve later left rows.
          var go = true
          while (go && rCur != null) {
            val c = keyOrd.compare(rCurKey, k)
            if (c < 0) advanceRight()
            else if (c == 0) {
              val rts = rTsProj(rCur)
              if (rts.isNullAt(0) || tsOrd.compare(rts, ts) < 0) advanceRight()
              else go = false
            } else go = false
          }
          if (rCur != null && keyOrd.compare(rCurKey, k) == 0) matched = rCur
        }
        outProj(joined(l, if (matched != null) matched else nullRight))
      }
    }
  }
}

/** Registration + DataFrame-facing constructor. */
object AsofMergePlans {

  /** Idempotently add the strategy + pushdown rule to a session that was
    * not built with spark.sql.extensions=graft.core.GraftExtensions.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofMergeJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofMergeJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsofMergeJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsofMergeJoin
    }
  }
}
