package graft

import org.apache.spark.sql.functions._

/** Scratch stage timing for q241 textRank internals (optimization round;
  * not driver contract).
  */
object Scratch241 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = if (args.nonEmpty) args(0).toInt else 4
    val spark = graft.core.GraftSession.local("scratch241", cpus)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val h = graft.functions.TextFunctions.md5Long _

    (1 to runs).foreach { _ =>
      def stamp[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.3f")
        r
      }
      val toks = stamp("toks_ckpt") {
        graft.core.Parallelism.spread(
            docs.select(col("doc_id").as("__doc"), col("text").as("__text")))
          .select(graft.functions.TextFunctions.tokens(col("__text")).as("__ts"))
          .localCheckpoint()
      }
      val hashed = toks.select(transform(col("__ts"), w => h(w)).as("__hs"))
      val pairCells = (1 to 2).flatMap { d =>
        Seq(
          transform(col("__hs"), (x, i) => struct(x.as("a"),
            try_element_at(col("__hs"), i + lit(d + 1)).as("b"))),
          transform(col("__hs"), (x, i) => struct(
            try_element_at(col("__hs"), i + lit(d + 1)).as("a"), x.as("b"))))
      }
      val edges = stamp("edges_ckpt") {
        hashed
          .select(explode(flatten(array(pairCells: _*))).as("__p"))
          .filter(col("__p.a").isNotNull && col("__p.b").isNotNull &&
            col("__p.a") =!= col("__p.b"))
          .select(col("__p.a").as("src"), col("__p.b").as("dst"))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
          .localCheckpoint()
      }
      val dict = stamp("dict_ckpt") {
        toks.select(explode(col("__ts")).as("token")).distinct()
          .select(col("token"), h(col("token")).as("id"))
          .localCheckpoint()
      }
      val ranks = stamp("pagerank") {
        graft.operators.Graph.pageRankWeighted(
          dict.select(col("id")).distinct(), col("id"),
          edges, col("src"), col("dst"), col("w"), 3)
      }
      stamp("final_join") {
        dict.join(ranks, Seq("id"))
          .select(col("token"), col("rank_fp"))
          .orderBy(col("rank_fp").desc, col("token").asc)
          .limit(20).count()
      }
      graft.core.SessionHygiene.drain(spark)
      println("---")
    }
    spark.stop()
  }
}
