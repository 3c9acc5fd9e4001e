package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and n-gram-Jaccard near-dup detection. The reference only ever
  * dedups exact ids (retrieve.py:1584-1593); the near-dup family is the
  * engine's 100 TB extension (BASELINE.json north star).
  *
  * Scale posture, per algorithm:
  *  - exact: single hash-aggregation on a 64/128-bit digest of the content,
  *    never on the raw text (shuffle bytes ∝ digest, not document).
  *  - MinHash/LSH: signatures are fixed-width arrays; the only shuffle is
  *    the band-bucket explode + self-join, whose fan-out is controlled by
  *    (bands, rowsPerBand). Candidate pairs then verify exactly. This is
  *    the standard shingle→minhash→band→bucket-join pipeline.
  *  - SimHash: one 64-bit signature per doc; near-dup = identical signature
  *    band keys (hamming proxy), avoiding any quadratic stage.
  *  - n-gram Jaccard: exact pairwise verify, driven by an inverted-index
  *    join on shingles; use only downstream of a blocking stage at scale.
  */
object Dedup {

  /** Exact dedup: canonical row per identical `contentCol` (min of `idCol`).
    * Hashes before shuffling so the exchange carries 8-byte keys.
    */
  def exact(df: DataFrame, idCol: Column, contentCol: Column): DataFrame =
    df.withColumn("__h", xxhash64(contentCol))
      .groupBy(col("__h"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_copies"))
      .drop("__h")

  /** Deterministic per-seed MinHash over a shingle array:
    * h_i(S) = min over shingles of ((a_i·x + b_i) mod p), x = 64-bit shingle
    * hash. Pure expression composition (no UDF, no ml.feature dependency on
    * a Vector column), so it runs inside codegen and the signature is an
    * `array<bigint>` ready for band slicing.
    */
  /** 2^31-1: keeps `a*x + b` under 2^62 — no Long overflow in ANSI mode. */
  val HashPrime: Long = 2147483647L

  private def seededCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (HashPrime - 1) + 1,
                         math.abs(rnd.nextLong()) % HashPrime))
  }

  def minHashSignature(shingleArr: Column, numHashes: Int): Column = {
    val hashes = seededCoeffs(numHashes).map { case (a, b) =>
      array_min(transform(shingleArr, s =>
        pmod(pmod(xxhash64(s), lit(HashPrime)) * lit(a) + lit(b), lit(HashPrime))))
    }
    array(hashes: _*)
  }

  /** MinHash LSH near-dup pairs.
    * @param df must have a unique id column `idCol` and text `textCol`.
    * Bands of `rowsPerBand` signature slots become bucket keys; docs
    * sharing any band bucket are candidates; candidates are verified with
    * exact shingle Jaccard ≥ `threshold`.
    */
  def minHashLsh(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df
      .select(idCol.as("id"), distinctShingles(textCol, shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
    val banded = withSig.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
      }: _*)).as("bb"))
    val l = banded.select(col("bb"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("bb"), col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = l.join(r, Seq("bb")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over token hashes: bit j of the signature is the sign of
    * Σ_tokens (±1 depending on bit j of the token hash). Expression-only.
    */
  def simHash(textCol: Column): Column = {
    val tokHashes = transform(tokens(textCol), w => xxhash64(w))
    val bits = (0 until 64).map { j =>
      val bitSum = aggregate(tokHashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Exact n-gram Jaccard similarity for all candidate pairs produced by an
    * inverted-index self-join on shingles. Quadratic in bucket size — gate
    * behind LSH blocking at scale (see minHashLsh); exposed directly for
    * oracle-checkable exact semantics on bounded inputs.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 3, threshold: Double = 0.0): DataFrame = {
    val sh = df.select(idCol.as("id"), distinctShingles(textCol, shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = sh.select(col("id"), col("sh"), explode(col("sh")).as("g"))
    val pairs = inv.select(col("g"), col("id").as("id_a"), size(col("sh")).as("n_a"))
      .join(inv.select(col("g"), col("id").as("id_b"), size(col("sh")).as("n_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
