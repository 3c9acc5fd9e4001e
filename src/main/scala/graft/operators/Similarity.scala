package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * engine's ANN extension (BASELINE.json north star; the reference's
  * nearest analog is the external rerank model, retrieve.py:183-232).
  *
  * Two tiers:
  *  - `cosineTopK`: brute-force exact top-k. The query side is broadcast
  *    (queries ≪ candidates), so the candidate scan is embarrassingly
  *    parallel with NO shuffle until the final per-query top-k window over
  *    |queries|·k rows. This is the right plan up to ~10^9 candidates ·
  *    small query batches on a real cluster.
  *  - `ivfTopK`: IVF-style pruning — k-means-ish centroid assignment done
  *    as "nearest of C fixed probe vectors" (deterministic, data-independent
  *    probes; a trained codebook would be swapped in the same shape).
  *    Candidates are bucketed once; each query probes only `nprobe`
  *    buckets, cutting the scanned fraction to nprobe/C.
  *
  * Dot products are expression-only (`aggregate`/`zip_with` in double
  * precision, left-to-right — deterministic and oracle-reproducible).
  */
object Similarity {

  /** Double-precision sequential dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * @param queries    (queryIdCol, queryVecCol) — small, broadcast
    * @param candidates (candIdCol, candVecCol)
    */
  def cosineTopK(
      queries: DataFrame, queryId: String, queryVec: String,
      candidates: DataFrame, candId: String, candVec: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val crossed = candidates
      .join(broadcast(queries), if (excludeSelf) queries(queryId) =!= candidates(candId) else lit(true))
      .select(
        queries(queryId).as("query_id"),
        candidates(candId).as("cand_id"),
        cosine(queries(queryVec), candidates(candVec)).as("cos"))
    Ranking.topKPerGroup(
      crossed, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** Exact pairwise cosine near-dup pairs over one vector set. Quadratic —
    * bound the input (or block via ivfBucket/LSH first) at scale; this is
    * the VERIFY stage of embedding dedup, mirroring Dedup.ngramJaccardPairs.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("c"))
      .filter(col("c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c"), 4).as("cos"))
  }

  /** Deterministic probe vectors for IVF bucketing: probe c has +1 at
    * dims where bit (dim % 16) of a seeded hash pattern is set. A stand-in
    * codebook — the bucketing/probing plan shape is what matters.
    */
  private def probeSign(c: Int, d: Int): Double = {
    // xorshift-mixed, fixed seed — stable across JVMs
    var x = (c * 2654435761L) ^ (d * 40503L) ^ 42L
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** Assign each vector to its best of `nCentroids` random-hyperplane-ish
    * probes (argmax of signed sum) — IVF bucket id as a plain expression.
    */
  def ivfBucket(vec: Column, dim: Int, nCentroids: Int): Column = {
    val scores = (0 until nCentroids).map { c =>
      val coeffs = (0 until dim).map(d => probeSign(c, d))
      val terms = zip_with(vec, typedLit(coeffs), (x, w) => x.cast("double") * w)
      struct(aggregate(terms, lit(0.0), (a, v) => a + v).as("score"), lit(c).as("c"))
    }
    array_max(array(scores: _*)).getField("c")
  }

  /** IVF-pruned top-k: candidates bucketed once; each query scans only its
    * own bucket (nprobe=1 shape; union more probes for recall). Equi-join on
    * bucket id makes the scan a co-partitioned hash join, not a cross join.
    */
  def ivfTopK(
      queries: DataFrame, queryId: String, queryVec: String,
      candidates: DataFrame, candId: String, candVec: String,
      k: Int, dim: Int, nCentroids: Int = 16): DataFrame = {
    val qb = queries.withColumn("__bucket", ivfBucket(col(queryVec), dim, nCentroids))
    val cb = candidates.withColumn("__bucket", ivfBucket(col(candVec), dim, nCentroids))
    val scored = cb.join(broadcast(qb), Seq("__bucket"))
      .filter(qb(queryId) =!= cb(candId))
      .select(
        qb(queryId).as("query_id"),
        cb(candId).as("cand_id"),
        cosine(qb(queryVec), cb(candVec)).as("cos"))
    Ranking.topKPerGroup(
      scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }
}
