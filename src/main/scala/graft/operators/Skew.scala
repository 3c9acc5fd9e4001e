package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB posture (SURVEY.md §7: "salted
  * keys for skewed region joins").
  *
  * AQE's skew-join split (on by default in GraftSession) handles most
  * sort-merge skew at runtime; explicit salting remains necessary when
  * (a) a single key dominates a SHUFFLE AGGREGATION (AQE cannot split an
  * agg group), or (b) the skewed side feeds a window partition. The
  * region/education keys of the reference are exactly this shape: a few
  * provinces hold most institutions.
  */
object Skew {

  /** Two-phase salted aggregation: count-like/associative aggs per
    * (key, salt) first, then merge per key. Turns one hot reduce group
    * into `salts` parallel groups.
    *
    * @param aggs  (partialAgg, mergeAgg) pairs sharing an output name:
    *              e.g. (count(lit(1)).as("n"), sum(col("n")).as("n"))
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[Column], salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted join of a skewed fact against a dimension: the fact side gets a
    * random salt in [0, salts); the dim side is EXPLODED `salts` times so
    * every (key, salt) bucket finds its match. Use when the dim is too big
    * to broadcast and the fact's key histogram is spiky.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Exact semi-join with an explicit Bloom runtime filter: build a Bloom
    * filter over the dim keys (distributed agg; only the bit array reaches
    * the driver — `numBits/8` bytes, ~1.2 MB at 1M keys / 1% fpp), probe it
    * AT THE FACT SCAN so non-joining rows are dropped before the exchange,
    * then remove the Bloom's false positives with the exact left-semi join.
    * Result is bit-identical to `fact JOIN dim` left_semi; the Bloom stage
    * only changes how many rows the shuffle carries — at 100 TB that is the
    * difference between shuffling the full fact table and shuffling the
    * matching fraction.
    */
  def bloomSemiJoin(
      fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    fact
      .filter(graft.functions.BloomMightContain.expr(factKey, bloom))
      .join(dim, factKey === dimKey, "left_semi")
  }
}
