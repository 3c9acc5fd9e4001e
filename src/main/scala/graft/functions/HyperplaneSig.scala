package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Signed-random-projection LSH signature for embeddings (Charikar 2002)
  * — the cosine analog of the text SimHash: bit k of the signature is the
  * sign of the dot product with seeded hyperplane k. Vectors at small
  * cosine distance flip few bits, so embedding near-dup detection rides
  * the SAME banded hamming machinery as image dHash / audio contours /
  * text SimHash (`Dedup.hammingNearDupPairs`) — no clustering pass, no
  * pair quadratic, corpus-size-independent per-row cost.
  *
  * Exactness contract (q166): coordinates are milli-quantized once
  * (floor(v·1000 + 0.5), the PQ convention) and hyperplane coefficients
  * are CLOSED-FORM integers — c(k,i) = Knuth-hash(k·dim + i) mapped onto
  * [−1000, 1000] — so each dot product is an exact BIGINT and the oracle
  * replays every bit. A vote of exactly 0 leaves the bit CLEAR, matching
  * PolySimHash's `vote > 0` convention. 60 bits (like the text SimHash) so
  * banding by 4/bands keeps the unused top nibble zero on both engines —
  * the sign bit never carries data.
  *
  * Null/mis-shaped vectors (wrong dimension) → null signature: fail-visible,
  * not silently bucketed with the zero vector.
  */
case class HyperplaneSig(child: Expression, dim: Int, nBits: Int = 60)
    extends UnaryExpression with RefKernelCodegen {

  require(dim >= 1, "dim must be >= 1")
  require(nBits >= 1 && nBits <= 60, "nBits must be in [1, 60]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = s"hyperplane_sig_${dim}_$nBits"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  /** c(k,i) = ((k·dim + i)·2654435761) mod 2147483647 mod 2001 − 1000. */
  @inline private def coef(k: Int, i: Int): Long =
    ((k.toLong * dim + i) * 2654435761L) % 2147483647L % 2001L - 1000L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val q = PqOps.quantizeVec(arr)
    var sig = 0L
    var k = 0
    while (k < nBits) {
      var dot = 0L
      var i = 0
      while (i < dim) {
        dot += q(i) * coef(k, i)
        i += 1
      }
      if (dot > 0) sig |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

object HyperplaneSig {
  /** Column bridge (dim and width baked into the registered name). */
  def expr(c: Column, dim: Int, nBits: Int = 60): Column = {
    val name = s"graft_hyperplane_sig_${dim}_$nBits"
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach {
      _.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => HyperplaneSig(exprs.head, dim, nBits), "built-in")
    }
    org.apache.spark.sql.functions.call_function(name, c)
  }
}
