package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * standard technique for making a 100 TB table prunable on TWO predicate
  * columns at once. A table sorted by `a` prunes scans on `a` only; a
  * table clustered by interleaved bits of `(a, b)` gives every file a
  * tight min/max envelope on BOTH columns, so parquet row-group stats
  * skip most files for any box predicate (the same layout Delta/Iceberg
  * `OPTIMIZE ZORDER BY` produces — built here from plain Spark:
  * repartitionByRange + sortWithinPartitions on the Morton key).
  *
  * The key is composed from built-in shift/mask expressions (fully
  * codegen'd, SQL-replayable — q144's oracle runs the identical
  * arithmetic in DuckDB), not a UDF.
  */
object Layout {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `v` onto even bit positions (Morton
    * spread): bit i of v lands on bit 2i. The classic 5-step
    * shift-or-mask ladder, expressed as Column arithmetic.
    */
  def bitSpread(v: Column): Column =
    Masks.foldLeft(v.cast("long")) { case (acc, (shift, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, shift))).bitwiseAND(lit(mask))
    }

  /** The SQL twin of [[bitSpread]] (the oracle's copy of the ladder —
    * q144/q195 replay it in DuckDB): same steps, same masks, one
    * definition for both so they cannot drift.
    */
  def bitSpreadSql(v: String): String =
    Masks.foldLeft(v) { case (acc, (sh, m)) =>
      s"((($acc) | (($acc) << $sh)) & $m)"
    }

  /** The Morton / Z-order key of two non-negative dimension values:
    * x's bits on even positions, y's on odd. Each input must fit 31 bits
    * (callers bucket/normalize first — rank, hash or modulo); the result
    * then fits 62 bits, sign-safe in a BIGINT.
    */
  def zOrderKey(x: Column, y: Column): Column =
    bitSpread(x).bitwiseOR(shiftleft(bitSpread(y), 1))

  /** Write `df` Z-order-clustered on `(x, y)` into `nFiles` files:
    * range-partition by the Morton key (one exchange — contiguous,
    * disjoint key ranges per file), sort within each partition, write.
    * Each output file then carries a tight min/max envelope on BOTH
    * dimensions for scan pruning.
    */
  def writeZOrdered(df: DataFrame, outDir: String, x: Column, y: Column,
      nFiles: Int): Unit =
    df.withColumn("__z", zOrderKey(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
