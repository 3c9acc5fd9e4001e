package graft

import graft.operators.Frequency
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame, t: Long) =
    df.groupBy(col("item")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def viaSketch(df: org.apache.spark.sql.DataFrame, t: Long) =
    Frequency.frequentItems(df, col("item"), t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("equals plain group-by-having on a skewed stream") {
    // zipf-ish: item k appears ~ 5000/k times
    val rows = (1 to 60).flatMap(k => Seq.fill(5000 / k)(s"item_$k"))
    val df = spark.sparkContext.parallelize(rows, 16).toDF("item")
    Seq(2L, 50L, 500L, 4000L, 100000L).foreach { t =>
      assert(viaSketch(df, t) == exact(df, t), s"threshold $t")
    }
  }

  test("all-distinct stream returns empty; exact threshold boundary holds") {
    val distinct = spark.range(0, 5000).select(concat(lit("u"), col("id")).as("item"))
    assert(viaSketch(distinct, 2L).isEmpty)
    // items at exactly minCount survive; minCount-1 do not
    val edge = (Seq.fill(7)("seven") ++ Seq.fill(6)("six") ++
      (1 to 2000).map(i => s"noise_$i")).toDF("item")
    val got = viaSketch(edge.repartition(8), 7L)
    assert(got == Map("seven" -> 7L))
  }

  test("qualifiers concentrated in one partition still found (pigeonhole direction)") {
    // heavy item lives ENTIRELY in partition 0 among local noise
    val heavy = Seq.fill(300)("hot") ++ (1 to 3000).map(i => s"a_$i")
    val rest = (1 to 20000).map(i => s"b_${i % 7000}")
    val df = spark.sparkContext.parallelize(heavy, 1)
      .union(spark.sparkContext.parallelize(rest, 15)).toDF("item")
    val got = viaSketch(df, 300L)
    val want = exact(df, 300L)
    assert(got == want && got.contains("hot"))
  }

  test("nulls ignored; minCount < 2 rejected") {
    val df = Seq(Some("x"), None, Some("x"), Some("y")).toDF("item")
    assert(viaSketch(df, 2L) == Map("x" -> 2L))
    intercept[IllegalArgumentException] {
      Frequency.frequentItems(df, col("item"), 1L)
    }
  }

  test("tiny sketch under eviction pressure still exact (decrement-tracked emission)") {
    // capacity 64 over a stream with heavy churn: 20 hot items + distinct
    // noise forcing constant batch decrements
    val rows = (1 to 20).flatMap(k => Seq.fill(400)(s"hot_$k")) ++
      (1 to 8000).map(i => s"noise_$i")
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 4)
      .toDF("item")
    val got = Frequency.frequentItems(df, col("item"), 400L, sketchCapacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == (1 to 20).map(k => s"hot_$k" -> 400L).toMap)
  }

  test("fails fast when the guarantee cannot hold, instead of dropping qualifiers") {
    // capacity 64, all-distinct flood, tiny threshold: D must cross the
    // bar and the operator must refuse rather than return wrong answers
    val df = spark.range(0, 200000).select(concat(lit("u"), col("id")).as("item"))
      .repartition(2)
    val ex = intercept[org.apache.spark.SparkException] {
      Frequency.frequentItems(df, col("item"), 2L, sketchCapacity = 64).collect()
    }
    assert(ex.getMessage.contains("frequentItems") ||
      Option(ex.getCause).exists(_.getMessage.contains("frequentItems")))
  }
}
