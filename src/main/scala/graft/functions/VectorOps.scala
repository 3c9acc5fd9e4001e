package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Compiled cosine similarity over two `array<float>` columns — one tight
  * loop instead of the zip_with/aggregate interpreted-HOF stack.
  *
  * Bit-compatibility contract (oracle-checked): accumulates x·y, x·x, y·y
  * as doubles left-to-right and returns `xy / (sqrt(xx) * sqrt(yy))` — the
  * exact operation order of the composable form AND of DuckDB's
  * list_cosine_similarity on DOUBLE[], so hash-matching continues to hold.
  * Mismatched array widths yield NULL, matching the zip_with/aggregate
  * composable form (zip_with pads the short side with nulls → null sum) —
  * corrupted embeddings surface as missing scores, never plausible ones.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      xy += xi * yi
      xx += xi * xi
      yy += yi * yi
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }
}

object CosineSim {
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    org.apache.spark.sql.functions.call_function("graft_cosine_sim", a, b)
  }
}
