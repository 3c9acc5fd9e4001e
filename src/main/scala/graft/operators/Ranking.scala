package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / dedup building blocks shared across the engine
  * (SURVEY.md §2.4 A7/A9, §2.5 W1/W2/W5).
  *
  * All of these are single-shuffle window plans: the exchange is on the
  * partition keys and the sort is local. At 100 TB the partition key is the
  * entity key (customer, chunk, user) — high cardinality, so no hot
  * partitions; nothing here ever collects to the driver.
  */
object Ranking {

  /** Top-k rows per group with a total deterministic order
    * (retrieve.py:352-387 — the per-task top_k slice, default 20).
    * Pass `rankCol` to keep the 1-based rank (avoids consumers recomputing
    * an identical window just to surface the position).
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
      k: Int, rankCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val ranked = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    rankCol match {
      case Some(name) => ranked.withColumnRenamed("__rn", name)
      case None => ranked.drop("__rn")
    }
  }

  /** GLOBAL top-k with a total deterministic order (caller includes a
    * unique tiebreak in `orderBy`), safe at ANY k: per partition, a local
    * sort + `take(k)` in mapPartitions — zero exchanges by construction —
    * then the global rank over the ≤ k×P survivors. The declarative
    * rank-limit forms silently degrade to a FULL global sort of the input
    * once k crosses `spark.sql.optimizer.windowGroupLimitThreshold`
    * (1000) / `spark.sql.execution.topKSortFallbackThreshold` (10k) —
    * measured at 10M rows: 270 MB shuffled vs quota×partitions
    * (SCALE.md, DSIR receipt). The bounded final window is the
    * PlanGuard-exempt MapPartitions pattern.
    */
  def globalTopK(df: DataFrame, orderBy: Seq[Column], k: Int,
      rankCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sorted = df.sortWithinPartitions(orderBy: _*)
    val pruned = sorted.mapPartitions(_.take(k))(
      org.apache.spark.sql.Encoders.row(sorted.schema))
    val ranked = pruned
      .withColumn("__grk", row_number().over(Window.orderBy(orderBy: _*)))
      .filter(col("__grk") <= k)
    rankCol match {
      case Some(name) => ranked.withColumnRenamed("__grk", name)
      case None => ranked.drop("__grk")
    }
  }

  /** Keep-first dedup: one row per key, first under `orderBy` wins.
    * Covers the reference's `used_chunk_ids` sequential dedup (J5), the
    * meta-cache precedence rule (A9: `api_detail` beats snapshot), and
    * order-preserving URL dedup (A7) — all are the same window shape once
    * iteration order is made an explicit column (SURVEY.md §7).
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Positional (rank-zip) join — J7: i-th row of `left` under `leftOrder`
    * matched to i-th row of `right` under `rightOrder`, within shared group
    * key COLUMN NAMES (present on both sides — self-join safe: the right
    * side's non-key columns are suffixed `_r` to disambiguate lineage).
    * Ordered positional join = row_number on both sides + using-join on
    * (groupCols, rank); co-located after the two window shuffles.
    */
  def positionalJoin(
      left: DataFrame, right: DataFrame, groupCols: Seq[String],
      leftOrder: Seq[Column], rightOrder: Seq[Column],
      joinType: String = "inner"): DataFrame = {
    val lw = Window.partitionBy(groupCols.map(col): _*).orderBy(leftOrder: _*)
    val rw = Window.partitionBy(groupCols.map(col): _*).orderBy(rightOrder: _*)
    val l = left.withColumn("__pos", row_number().over(lw))
    val r = right.withColumn("__pos", row_number().over(rw))
    val rSafe = r.select(r.columns.map { c =>
      if (groupCols.contains(c) || c == "__pos") col(c) else col(c).as(c + "_r")
    }: _*)
    l.join(rSafe, groupCols :+ "__pos", joinType)
      .withColumnRenamed("__pos", "pos")
  }

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    * 1998) — the diversity re-rank a retrieval stack runs AFTER scoring:
    * greedily pick the candidate maximizing
    * λ·relnorm − (1−λ)·max_{j∈selected} sim(i, j), so near-duplicates of
    * an already-picked result are penalized out of the top-k.
    *
    * Exact-integer contract: `relCol` is a nonnegative integer score
    * (e.g. BM25 score_fp); it is normalized per query to micro units
    * against the query's max (microRound6 — the one rounding), `simCol`
    * is a micro-unit similarity in [0, 1e6], λ arrives in TENTHS so the
    * selection objective L·relnorm − (10−L)·maxsim is a plain integer in
    * deci-micro units (displayed /1e7). Ties break on doc_id ascending.
    * The first pick has no selected set — max_sim reads null, objective
    * = L·relnorm.
    *
    * `cands`: (query_id, doc_id, rel); `sims`: (query_id, doc_a, doc_b,
    * sim) covering BOTH directions of every candidate pair (missing
    * pairs read sim 0). doc_id must be a nonnegative integral key (the
    * argmax tiebreak negates it through a struct max).
    *
    * Scale posture: the greedy loop is inherently sequential in k, but
    * the QUERY axis distributes — each query's candidates and sim pairs
    * gather into two arrays (one partial+final aggregate per side, both
    * exchanges on query_id so the join is co-partitioned) and the whole
    * k-step selection runs inside ONE compiled kernel call per query
    * ([[graft.functions.MmrScan]]). No checkpoints, no per-step jobs:
    * the step-unrolled predecessor paid 2 + k localCheckpoint barriers
    * plus per-step anti-join/aggregate jobs — q275's profile showed the
    * wall was that job count, not compute. k and the per-query candidate
    * count are small by contract (re-rank the retrieved page, not the
    * corpus; the kernel fails loud at 16384 candidates in one query).
    *
    * @return (query_id, sel_rank, doc_id, rel_norm, max_sim, mmr)
    */
  def mmrSelect(cands: DataFrame, sims: DataFrame, k: Int,
      lambdaTenths: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in 1..64, got $k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths must be in 0..10, got $lambdaTenths")
    val cArr = cands.groupBy(col("query_id"))
      .agg(collect_list(struct(col("doc_id").cast("long").as("d"),
        col("rel").cast("long").as("r"))).as("__c"))
    val sArr = sims.groupBy(col("query_id"))
      .agg(collect_list(struct(col("doc_a").cast("long").as("a"),
        col("doc_b").cast("long").as("b"),
        col("sim").cast("long").as("s"))).as("__s"))
    cArr.join(sArr, Seq("query_id"), "left")
      .select(col("query_id"),
        explode(graft.functions.MmrScan.expr(col("__c"), col("__s"),
          k, lambdaTenths)).as("__p"))
      .select(col("query_id"), col("__p.sel_rank").as("sel_rank"),
        col("__p.doc_id").as("doc_id"),
        (col("__p.rn").cast("double") / 1e6).as("rel_norm"),
        (col("__p.ms").cast("double") / 1e6).as("max_sim"),
        (col("__p.sc").cast("double") / 1e7).as("mmr"))
  }
}
