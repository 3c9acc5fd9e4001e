package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs end-to-end on sf0.001 (the t1 smoke scale);
  * full value-level correctness is the driver's DuckDB gate (and
  * tools/check_oracle.py locally).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle coverage or is a declared no-oracle op") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // only the engine-hash-dependent ops may omit the oracle (the 64-bit
    // production hash modes are exactly the non-DuckDB-portable surface)
    assert(noOracle.forall(n => n.contains("minhash") || n.contains("simhash") ||
      n.contains("ivf") || n.contains("spans64")),
      s"unexpected no-oracle queries: $noOracle")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, SparkTestSession.Sf0001)
      assert(df.columns.nonEmpty)
      df.count()   // forces full execution
    }
  }
}
