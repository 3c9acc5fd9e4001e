package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide frequent-item mining ("heavy hitters") without shuffling
  * the long tail — the vocabulary/boilerplate/hot-URL profiling pass of a
  * corpus pipeline at 100 TB, where the naive `groupBy(item).count()`
  * shuffles EVERY distinct item (trillions of singleton tokens) to find
  * the handful above threshold.
  *
  * Two-phase with an EXACT result:
  *
  *  1. **Candidate generation (pigeonhole, per partition)**: an item with
  *     global count ≥ T must have count ≥ ceil(T/P) in at least one of
  *     the P partitions. Each partition finds its local-bar qualifiers
  *     with a Misra–Gries summary of `sketchCapacity` counters: the
  *     cumulative batch-decrement D is tracked EXACTLY and obeys the
  *     standard bound D ≤ partitionRows/capacity; every item's counter
  *     under-estimates its true local count by at most D, and an absent
  *     item has true count ≤ D. Emitting `counter + D ≥ bar` is
  *     therefore a PROVABLE superset of the true local qualifiers
  *     whenever D < bar — which the operator CHECKS at partition end,
  *     failing fast (rather than silently dropping a qualifier) when the
  *     partition is so large relative to the threshold that the sketch
  *     cannot carry the guarantee. The condition is global-scale
  *     friendly: it holds whenever corpusRows < T × capacity (partition
  *     count cancels), e.g. T ≥ 25k on a 100-billion-row corpus at the
  *     default capacity — thresholds below that make the output itself
  *     huge and the plain groupBy the right plan.
  *  2. **Exact recount**: the candidate set (≤ N·P/T items by pigeonhole)
  *     broadcasts back as a semi-join; only candidate rows reach the ONE
  *     keyed aggregation, and the final `count ≥ T` filter runs on exact
  *     counts.
  *
  * The result equals `groupBy.having(count >= T)` row for row (q149's
  * oracle states exactly that) — the sketch only prunes, never decides.
  * Batch decrement-by-min makes the per-item sketch cost amortized O(1):
  * each O(capacity) pass retires at least `capacity` units of counted
  * mass, and total mass is the partition's row count.
  */
object Frequency {

  /** Misra–Gries summary with batch decrement-by-min eviction. Counter
    * invariant: true − decremented ≤ counter ≤ true.
    */
  private final class MisraGries(capacity: Int) {
    private val counts = new java.util.HashMap[String, java.lang.Long](capacity / 2)
    var decremented = 0L

    def offer(item: String): Unit = {
      val cur = counts.get(item)
      if (cur != null) {
        counts.put(item, cur + 1L)
      } else if (counts.size < capacity) {
        counts.put(item, 1L)
      } else {
        // batch decrement by the current minimum: frees every min-count
        // slot in one pass (amortized O(1)/offer by the mass argument)
        var minVal = Long.MaxValue
        val vit = counts.values().iterator()
        while (vit.hasNext) { val v = vit.next(); if (v < minVal) minVal = v }
        decremented += minVal
        val entries = counts.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          val nv = e.getValue - minVal
          if (nv <= 0L) entries.remove() else e.setValue(nv)
        }
        counts.put(item, 1L)
      }
    }

    def entries: Iterator[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.iterator.map(e => (e.getKey, e.getValue.longValue()))
    }
  }

  /** All items with exact global count ≥ `minCount`.
    *
    * @param df        input rows.
    * @param itemCol   string item (token, URL, line hash rendered to
    *                  string — anything group-able).
    * @param minCount  the global threshold T (≥ 2; T = 1 is just distinct).
    * @param sketchCapacity Misra–Gries counters per partition (memory ∝
    *                  capacity × item width). The exactness guarantee
    *                  needs the tracked decrement D < ceil(T/P), which
    *                  the default (2²⁰) carries for any corpus smaller
    *                  than T × 2²⁰ rows; violations FAIL FAST.
    * @param numPartitionsHint when > 0, overrides the partition count P in
    *                  the per-partition bar ceil(T/P). The bar must use a
    *                  P at LEAST the actual partition count (pigeonhole
    *                  direction) — the default reads the frame's.
    * Returns (item, n) with exact counts, n ≥ minCount.
    */
  def frequentItems(
      df: DataFrame, itemCol: Column, minCount: Long,
      sketchCapacity: Int = 1 << 20,
      numPartitionsHint: Int = 0): DataFrame = {
    require(minCount >= 2, "minCount must be >= 2 (1 is just distinct())")
    require(sketchCapacity >= 64, "sketchCapacity must be >= 64")
    val items = df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
    // ONE materialized RDD serves both the partition count and the sketch
    // pass: the pigeonhole bar needs bar-P >= actual-P, and reading the
    // count from a separate physical plan than the one that executes
    // would let the two drift (e.g. under adaptive re-planning) in the
    // silent-wrong-answer direction. Structural sharing guarantees it.
    val itemsRdd = items.rdd
    val actualP = math.max(1, itemsRdd.getNumPartitions)
    if (numPartitionsHint > 0) require(numPartitionsHint >= actualP,
      s"frequentItems: numPartitionsHint=$numPartitionsHint is below the " +
        s"actual partition count $actualP — the pigeonhole bar would be " +
        "too generous and the candidate superset guarantee would not hold")
    val p = if (numPartitionsHint > 0) numPartitionsHint else actualP
    val bar = math.max(1L, (minCount + p - 1) / p) // ceil(T/P)
    import items.sparkSession.implicits._
    val candRdd = itemsRdd.mapPartitions { rows =>
      val sketch = new MisraGries(sketchCapacity)
      var n = 0L
      rows.foreach { r => n += 1; sketch.offer(r.getString(0)) }
      val d = sketch.decremented
      if (d >= bar) throw new IllegalStateException(
        s"frequentItems: sketch decrement $d reached the per-partition bar " +
          s"$bar ($n rows in partition, capacity $sketchCapacity) — the " +
          "candidate superset guarantee no longer holds. Raise " +
          "sketchCapacity or minCount, or use a plain groupBy (the " +
          "threshold is small enough that the output is the long tail).")
      // counter under-estimates by ≤ D: counter + D ≥ bar is a superset
      // of true-local-count ≥ bar; the exact recount removes the extras
      sketch.entries.collect { case (item, c) if c + d >= bar => item }
    }
    val candidates =
      items.sparkSession.createDataset(candRdd).toDF("item").distinct()
    items.join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
