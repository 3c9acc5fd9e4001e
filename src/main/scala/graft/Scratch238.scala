package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch component timing for q238 corrMatrix (optimization round; not
  * driver contract).
  */
object Scratch238 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = if (args.nonEmpty) args(0).toInt else 5
    val spark = graft.core.GraftSession.local("scratch238", cpus)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val names = Seq("qty", "price", "disc", "tax")
    val exprs = Seq("ROUND(l_quantity)", "ROUND(l_extendedprice / 100)",
      "ROUND(l_discount * 100)", "ROUND(l_tax * 100)")
    def baseRaw = li.select(names.zip(exprs).map { case (n, e) =>
      expr(e).cast("long").as(n) }: _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
    def baseSpread = graft.core.Parallelism.spread(li)
      .select(names.zip(exprs).map { case (n, e) =>
        expr(e).cast("long").as(n) }: _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
    def centeredProducts(base: DataFrame, long: Boolean) = {
      val c = base.select(names.map(n => (col(n) - lit(50L)).as(n)): _*)
      val pairs = for { i <- names.indices; j <- i until names.size }
        yield (names(i), names(j))
      c.agg(
        sum(dec(col(names.head))).as("t0"),
        pairs.map { case (a, b) =>
          (if (long) sum(dec(col(a) * col(b)))
           else sum(dec(col(a)) * dec(col(b)))).as(s"s_${a}_$b") }: _*)
    }
    val experiments: Seq[(String, () => DataFrame)] = Seq(
      "scan4" -> (() => li.select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))),
      "base_raw_1task" -> (() => baseRaw),
      "base_spread" -> (() => baseSpread),
      "products_dec_1task" -> (() => centeredProducts(baseRaw, long = false)),
      "products_long_1task" -> (() => centeredProducts(baseRaw, long = true)),
      "products_dec_spread" -> (() => centeredProducts(baseSpread, long = false)),
      "products_long_spread" -> (() => centeredProducts(baseSpread, long = true)),
      "full_query" -> (() => SparkEntry.queries("q238_corr_matrix")(spark, sfDir))
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
