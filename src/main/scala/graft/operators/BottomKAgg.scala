package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k DISTINCT longs as a typed Aggregator — the single-pass,
  * map-side-combining build of the KMV sketch ([[Sketches.kmvRegisters]]
  * semantics). The window form's one exchange carries the full distinct
  * (group, hash) set — vocabulary-sized; this aggregator's exchange
  * carries one ≤ k-long buffer per (partition, group), input-size-
  * independent, and because it is a single aggregation it also runs
  * under Structured Streaming (complete/update mode), which the
  * distinct + window form cannot.
  *
  * Buffer = sorted distinct array capped at k. reduce is a binary
  * search: once the buffer saturates, values above the k-th minimum are
  * rejected in O(log k) — the common case; only ~k·ln(n/k) of n uniform
  * draws ever trigger the O(k) insert. merge is a bounded sorted-dedup
  * merge of two ≤ k arrays.
  */
class BottomKAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 1 && k <= 65536, s"bad bottom-k: $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length >= k && ins >= k) buf // beyond the k-th minimum
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0
    var j = 0
    var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val x = a(i); i += 1
          if (j < b.length && b(j) == x) j += 1 // shared value: take once
          x
        } else { val x = b(j); j += 1; x }
      out(o) = v
      o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
