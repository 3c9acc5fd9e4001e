package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over EVERY declared query: the r2 verdict's
  * scale-killer class — `WindowExec` with an empty partition spec ("Moving
  * all data to a single partition") — must never reappear. Checked on the
  * pre-AQE physical plan at sf0.001. Note the cost is NOT planning-only:
  * some query BUILDERS run real work before returning their DataFrame
  * (fixture writes, q86's component loop), so this spec re-executes that
  * slice of the suite at the smallest SF — a few seconds, accepted for the
  * breadth of the guarantee.
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** An unpartitioned window is exempt when a `MapPartitionsExec` sits
    * DIRECTLY below it (through pass-through nodes only — project /
    * filter / sort / exchange / object serialization): that is the
    * bounded-prune pattern (`Ranking.globalTopK`'s per-partition
    * `take(k)`), which caps the window's input at k × partitions
    * regardless of corpus size. A deep `exists` would also excuse a
    * window over the FULL output of any mapPartitions-based ingest
    * (WARC, archives, multimodal decode) — exactly the regression this
    * guard exists to catch.
    */
  @annotation.tailrec
  private def boundedPruneBelow(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.MapPartitionsExec => true
    // a TakeOrderedAndProject is itself bounding: output ≤ its limit
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case pass @ (_: org.apache.spark.sql.execution.ProjectExec |
                 _: org.apache.spark.sql.execution.FilterExec |
                 _: org.apache.spark.sql.execution.SortExec |
                 _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec |
                 _: org.apache.spark.sql.execution.SerializeFromObjectExec |
                 _: org.apache.spark.sql.execution.DeserializeToObjectExec) =>
      boundedPruneBelow(pass.children.head)
    case _ => false
  }

  private def unpartitionedWindows(plan: SparkPlan): Seq[String] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        !boundedPruneBelow(w.child) => w.nodeName
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty &&
        !boundedPruneBelow(w.child) => w.nodeName
    }

  test("no query plans a single-partition (unpartitioned) window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, SparkTestSession.Sf0001).queryExecution.sparkPlan
      unpartitionedWindows(plan).map(n => s"$name: $n")
    }
    assert(offenders.isEmpty,
      s"single-partition windows found:\n${offenders.mkString("\n")}")
  }

  test("q01 keeps its filter pushed into the parquet scan") {
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, SparkTestSession.Sf0001)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters: [Is") || plan.contains("PushedFilters: [Less") ||
      plan.matches("(?s).*PushedFilters: \\[[^\\]].*"),
      s"no pushed filters in q01 scan:\n${plan.take(1500)}")
  }

  test("q81 large-cap CSV read stays distributed (no driver-side row scan)") {
    // cap > Csv.DriverCapMax must take the distributed limit path: the
    // plan scans the CSV file directly — no LocalTableScan of data rows
    // rebuilt from a head() collect (the r3 verdict's S3 scale risk)
    val plan = SparkEntry.queries("q81_csv_roundtrip")(spark, SparkTestSession.Sf0001)
      .queryExecution.sparkPlan
    val localScans = plan.collect {
      case l: org.apache.spark.sql.execution.LocalTableScanExec if l.rows.nonEmpty => l
    }
    assert(localScans.isEmpty,
      s"q81 materialized rows on the driver: ${localScans.mkString(", ")}")
    assert(plan.toString.contains("csv") || plan.toString.contains("Csv"),
      "q81 plan lost its distributed CSV scan")
  }

  test("q66 hash split stays a zero-exchange projection") {
    val plan = SparkEntry.queries("q66_hash_split")(spark, SparkTestSession.Sf0001)
      .queryExecution.sparkPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "q66 must not shuffle — split is a pure projection")
  }

  test("q122 within-doc line dedup stays a zero-exchange projection") {
    // per-row semantics: the first form of this operator exploded into a
    // corpus-wide (id, hash) SortAggregate pair + rejoin (8x slower at
    // sf0.1); the compiled PolyFirstOccurrence projection must never grow
    // an exchange back
    val plan = SparkEntry.queries("q122_line_dedup_doc")(spark, SparkTestSession.Sf0001)
      .queryExecution.sparkPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      "q122 must not shuffle — within-doc dedup is a pure projection")
  }
}
