package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Robust winnowing (Schleimer/Wilkerson/Aiken 2003) over a k-gram hash
  * array as ONE compiled sliding-window pass — the kernel behind
  * [[graft.operators.Dedup.winnowedFingerprints]].
  *
  * Semantics are EXACTLY the composable form it replaces: for every
  * window of `w` consecutive gram hashes (one whole-array window when the
  * doc has fewer than `w` grams), select the RIGHTMOST minimal hash; the
  * result is the set of selected (pos, h) pairs, `pos` the 1-based gram
  * index. The composable form exploded one row per window and ran
  * slice + array_min + reverse + array_position per window — three array
  * allocations per window, O(n·w) work; this kernel is a monotonic-deque
  * scan, O(n) with zero allocation per window, and emits each selected
  * (pos, h) once (consecutive windows selecting the same fingerprint
  * collapse — the downstream `.distinct()` made that set semantics
  * anyway, and within one doc a fingerprint position can only repeat in
  * CONSECUTIVE windows, so local collapse = per-doc distinct on (pos, h)).
  *
  * Rightmost-min tiebreak falls out of the deque inequality: an incoming
  * value pops every queued value ≥ it (equal included), so the front is
  * always the latest index attaining the window minimum.
  */
case class WinnowSelect(child: Expression, w: Int)
    extends UnaryExpression with RefKernelCodegen {

  require(w >= 2 && w <= 64, s"w must be in 2..64, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"winnow_select_$w"

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val g = arr.toLongArray()
    val effW = math.min(w, n)
    // monotonic deque of indices; values strictly increasing front→back
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.ArrayList[Any](math.max(4, n / effW * 2))
    var lastPos = -1
    var i = 0
    while (i < n) {
      val v = g(i)
      while (tail > head && g(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      val winStart = i - effW + 1
      if (winStart >= 0) {
        while (dq(head) < winStart) head += 1
        val sel = dq(head)
        if (sel != lastPos) {
          out.add(new GenericInternalRow(
            Array[Any]((sel + 1).toLong, g(sel))): InternalRow)
          lastPos = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
