package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing harness for optimization experiments (not part of the
  * driver contract; delete or ignore). Times named experiment bodies with
  * the bench's construct-per-rep methodology.
  */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = if (args.nonEmpty) args(0).toInt else 4
    val spark = graft.core.GraftSession.local("scratch", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    def li = Tables.load(spark, sfDir, "lineitem")
    def baskets = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    def basketArrays = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("ps"))
    def pairsJoin = {
      val b = baskets
      b.as("a").join(b.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("c_ab"))
    }
    def pairsHof = basketArrays
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("c_ab"))
    def orderedHof = basketArrays
      .select(explode(flatten(transform(col("ps"), x =>
        transform(filter(col("ps"), y => y =!= x),
          y => struct(x.as("item"), y.as("partner")))))).as("pr"))
      .groupBy(col("pr.item").as("item"), col("pr.partner").as("partner"))
      .agg(count(lit(1)).as("c_ab"))
    def windowTop3(sym: DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      sym.withColumn("rnk", row_number().over(Window.partitionBy(col("item"))
        .orderBy(col("c_ab").desc, col("partner").asc)))
        .filter(col("rnk") <= 3)
    }

    val experiments: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => li.select(col("l_orderkey"), col("l_partkey"))),
      "baskets_distinct" -> (() => baskets),
      "basket_arrays" -> (() => basketArrays),
      "pairs_join" -> (() => pairsJoin),
      "pairs_hof" -> (() => pairsHof),
      "ordered_hof" -> (() => orderedHof),
      "q193_new_full" -> (() => windowTop3(orderedHof)),
      "q193_sym_from_pairs_hof" -> (() => {
        val p = pairsHof
        windowTop3(p.select(col("p1").as("item"), col("p2").as("partner"), col("c_ab"))
          .unionAll(p.select(col("p2").as("item"), col("p1").as("partner"), col("c_ab"))))
      }),
      "q193_fused_one_exchange" -> (() => {
        val arrays = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
        val exploded = arrays
          .select(explode(flatten(transform(col("ps"), x =>
            transform(filter(col("ps"), y => y =!= x),
              y => struct(x.as("item"), y.as("partner")))))).as("pr"))
          .select(col("pr.item").as("item"), col("pr.partner").as("partner"))
        windowTop3(exploded.repartition(col("item"))
          .groupBy(col("item"), col("partner")).agg(count(lit(1)).as("c_ab")))
      }),
      "q194_old_itemcnt" -> (() => baskets.groupBy(col("pk")).agg(count(lit(1)).as("c_item"))),
      "q194_new_itemcnt" -> (() => li.groupBy(col("l_partkey").as("pk"))
        .agg(count_distinct(col("l_orderkey")).as("c_item"))),
      "q194_full_new" -> (() => {
        val n = basketArrays.agg(count(lit(1)).as("n_orders"))
        val itemCnt = li.groupBy(col("l_partkey").as("pk"))
          .agg(count_distinct(col("l_orderkey")).as("c_item"))
        pairsHof
          .filter(col("c_ab") >= 3)
          .join(broadcast(itemCnt.select(col("pk").as("p1"), col("c_item").as("c_a"))), "p1")
          .join(broadcast(itemCnt.select(col("pk").as("p2"), col("c_item").as("c_b"))), "p2")
          .crossJoin(broadcast(n))
          .select(col("p1"), col("p2"), col("c_ab"), col("c_a"), col("c_b"),
            expr("(c_ab * n_orders * 1000000) div (c_a * c_b)").as("lift_fp"))
          .orderBy(col("lift_fp").desc, col("p1").asc, col("p2").asc)
          .limit(20)
      }),
      "ordered_hof_nosort" -> (() => {
        li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("ps"))
          .select(explode(flatten(transform(col("ps"), x =>
            transform(filter(col("ps"), y => y =!= x),
              y => struct(x.as("item"), y.as("partner")))))).as("pr"))
          .groupBy(col("pr.item").as("item"), col("pr.partner").as("partner"))
          .agg(count(lit(1)).as("c_ab"))
      })
    )
    experiments.foreach { case (name, mk) =>
      spark.sparkContext.setJobDescription(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name times=[${times.map(t => f"$t%.3f").mkString(",")}] min=${times.min}%.3f")
      graft.core.SessionHygiene.drain(spark)
    }
    spark.stop()
  }
}
