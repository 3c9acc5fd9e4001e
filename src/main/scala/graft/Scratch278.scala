package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Scratch component timing for q278 (optimization round; not driver
  * contract).
  */
object Scratch278 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = if (args.nonEmpty) args(0).toInt else 4
    val spark = graft.core.GraftSession.local("scratch278", cpus)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def d = graft.core.Parallelism.spread(docs)
      .select(col("source"), col("doc_id"),
        col("text"), TextFunctions.tokens(col("text")).as("__tk"))
    def tk = col("__tk")
    def cand = when(size(tk) > 0,
      array_join(concat(
        array(element_at(tk, 1), element_at(tk, 1)),
        transform(
          filter(sequence(lit(1), size(tk)), i => pmod(i, lit(7)) =!= 0),
          i => element_at(tk, i))), " ")).otherwise(lit(""))
    def pairs = d.select(col("source"), col("doc_id"), cand.as("cand"),
      col("text").as("ref"))
    def kernel = pairs.select(col("source"),
      graft.functions.BleuDocStats.expr(spark, col("cand"), col("ref"))
        .as("st"))
    def full = SparkEntry.queries("q278_corpus_bleu")(spark, sfDir)

    def statRow = pairs.select(col("source"), col("doc_id").as("__id"),
      explode(array(graft.functions.BleuDocStats.expr(spark,
        col("cand"), col("ref")))).as("__st"))
    def perDoc = statRow.select(col("source"),
      col("__st.cl").as("__cl"), col("__st.rl").as("__rl"),
      col("__st.m1").as("__m1"), col("__st.t1").as("__t1"),
      col("__st.m2").as("__m2"), col("__st.t2").as("__t2"))
    def agg = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__cl")).as("c_len"), sum(col("__rl")).as("r_len"),
        sum(col("__m1")).as("match1"), sum(col("__t1")).as("tot1"),
        sum(col("__m2")).as("match2"), sum(col("__t2")).as("tot2"))
    val experiments: Seq[(String, () => DataFrame)] = Seq(
      "scan_text" -> (() => docs.select(col("text"))),
      "tokens_only" -> (() => d.select(col("source"), col("doc_id"), tk)),
      "cand_build" -> (() => pairs),
      "kernel" -> (() => kernel),
      "statrow_generate" -> (() => statRow),
      "perdoc_fields" -> (() => perDoc),
      "group_agg" -> (() => agg),
      "full_noop" -> (() => full)
    )
    experiments.foreach { case (name, mk) =>
      spark.sparkContext.setJobDescription(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name times=[${times.map(t => f"$t%.3f").mkString(",")}] min=${times.min}%.3f")
      graft.core.SessionHygiene.drain(spark)
    }
    spark.stop()
  }
}
