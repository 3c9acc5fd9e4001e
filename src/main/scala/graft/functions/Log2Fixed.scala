package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point base-2 logarithm of a positive BIGINT, exact and
  * bit-portable across engines — the log kernel behind the perplexity
  * variant of the LM quality score (q102).
  *
  * `log2fp(m) = round-ish(log2(m) · 2^20)` computed with INTEGER ops only:
  *
  *   E    = length(bin(m)) − 1                  (floor log2; both Spark and
  *                                               DuckDB have `bin`)
  *   t    = normalize m to [2^20, 2^21) − 2^20  (shift by |E−20|)
  *   idx  = t div 1024,  r = t mod 1024
  *   frac = LUT(idx) + (LUT(idx+1) − LUT(idx)) · r div 1024
  *   out  = E · 2^20 + frac
  *
  * The 1025-entry mantissa table LUT(i) = round(log2(1 + i/1024) · 2^20) is
  * generated ONCE here (StrictMath — fdlibm-exact, identical on every JVM)
  * and embedded verbatim into the DuckDB oracle SQL via [[lutSqlList]], so
  * both engines evaluate the same integers by construction; libm's
  * not-correctly-rounded `log` never runs on either side. Accuracy vs true
  * log2: |err| ≲ 3·10⁻⁶ (mantissa truncation 2⁻²⁰ + linear-interp ≤ 2·10⁻⁷
  * + fixed-point grain 2⁻²⁰) — perplexity-faithful ranking, hash-exact
  * replay. Reference analog: CCNet's mean-log-p document scoring, the
  * filtering role retrieve.py's rule mode plays over quality-scored input.
  */
object Log2Fixed {

  /** Fractional bits of the fixed-point result. */
  val Scale: Int = 20
  val One: Long = 1L << Scale

  /** LUT(i) = round(log2(1 + i/1024) · 2^20), i ∈ [0, 1024]. */
  val Lut: Array[Long] = Array.tabulate(1025) { i =>
    Math.round(StrictMath.log1p(i / 1024.0) / StrictMath.log(2.0) * One)
  }

  /** The LUT as a DuckDB list literal — the oracle's copy of the table. */
  def lutSqlList: String = Lut.mkString("[", ",", "]")

  /** Fixed-point log2 of a positive long column. Every intermediate stays
    * in exact-integer range: `t < 2^20`, interp product `< 2^21`, so the
    * double-backed `/` casts are exact; the only wide value is the shift
    * normalization, done with true bit shifts (column-shift form of
    * shiftright/shiftleft via call_function — the functions API overload
    * only takes literal shifts).
    */
  def expr(m: Column): Column = {
    val e = (length(bin(m)) - 1).cast("int")
    val t = when(e >= Scale, call_function("shiftright", m, e - Scale))
      .otherwise(call_function("shiftleft", m, lit(Scale) - e)) - One
    val idx = (t / 1024).cast("long")
    val r = t - idx * lit(1024L)
    val lut = typedLit(Lut.toSeq)
    val lo = element_at(lut, (idx + 1).cast("int"))
    val hi = element_at(lut, (idx + 2).cast("int"))
    e.cast("long") * One + lo + ((hi - lo) * r / 1024).cast("long")
  }

  /** CTE fragment producing `i, v, vn` (LUT entry + next) for oracle SQL —
    * a log2fp in SQL is then `E·1048576 + v + (vn − v)·r // 1024` after
    * joining `l2` on `i = t // 1024` (kept textually parallel with [[expr]]).
    */
  def lutCteSql: String =
    s"""lut AS (SELECT unnest(range(0, 1025)) AS i, unnest($lutSqlList) AS v),
       l2 AS (SELECT i, v, LEAD(v) OVER (ORDER BY i) AS vn FROM lut)"""

  /** Scalar twin for specs: the same integer algorithm in plain Scala. */
  def apply(m: Long): Long = {
    require(m > 0, s"log2fp domain: $m")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(m)
    val t = (if (e >= Scale) m >> (e - Scale) else m << (Scale - e)) - One
    val idx = (t / 1024).toInt
    val r = t - idx * 1024L
    e.toLong * One + Lut(idx) + (Lut(idx + 1) - Lut(idx)) * r / 1024
  }
}
