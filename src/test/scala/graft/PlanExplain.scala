package graft

import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * queries to `<outDir>/<query>_<tag>.txt` (the judge checks plan claims
  * against these files), and optionally time each query in isolation
  * (min-of-N of the bench's `.count()` action) with per-run walls.
  *
  * Usage: runMain graft.PlanExplain <outDir> <tag> <q1,q2,...> [timedRuns]
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) and SPARK_GRAFT_CPUS like Bench.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val timedRuns = if (args.length > 3) args(3).toInt else 0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local("plan-explain", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // session warm like Bench so timings are comparable
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    names.foreach { name =>
      val full = SparkEntry.queries.keys.find(k =>
        k == name || k.startsWith(name + "_") || k.startsWith(name)).getOrElse(name)
      val df = SparkEntry.queries(full)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      spark.sparkContext.setJobDescription(s"$full explain+time")
      // bench methodology: CONSTRUCT the frame inside the timed region —
      // operators with eager internal checkpoints pay them per rep, as the
      // round driver's Bench does
      val times = (1 to timedRuns).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(full)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // after at least one execution AQE has finalized — record that too
      val finalPlan =
        if (timedRuns > 0) "\n== Final (AQE-executed) Plan ==\n" +
          df.queryExecution.executedPlan.toString.take(12000)
        else ""
      Files.writeString(outDir.resolve(s"${full}_$tag.txt"),
        s"== $full @ $sfDir ==\n$formatted$finalPlan")
      val ts = times.map(t => f"$t%.3f").mkString(",")
      println(f"PLANX $full times=[$ts] min=${if (times.isEmpty) -1 else times.min}%.3f")
      graft.core.SessionHygiene.drain(spark)
    }
    spark.stop()
  }
}
