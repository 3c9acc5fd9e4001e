package graft.queries

import graft.core.Tables
import graft.functions.{L2Norm, QuantizeStats, TextFunctions}
import graft.operators.{Chunker, Contamination, Mixture, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 training-data operators, oracle-checked: Gopher-style repetition
  * quality metrics, benchmark n-gram decontamination, deterministic source
  * mixture weighting, and embedding norm/quantization summaries. Every
  * metric is defined as a pure engine-independent function of the row, so
  * the DuckDB oracle reproduces each value exactly (not just statistically).
  */
object TrainingQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** The synthetic PII-bearing text over customer rows — ONE copy shared
    * by q74 (redaction output) and q277 (redaction edit-distance audit);
    * `piiBaseSql` is its DuckDB twin (`txt` over `customer`).
    */
  private def piiBase: org.apache.spark.sql.Column = concat(
    lit("reach "), col("c_name"),
    lit(" via "), lower(regexp_replace(col("c_name"), "#", ".")),
    lit("@mail.example"),
    when(pmod(col("c_custkey"), lit(5)) === 0,
      concat(lit(" cc backup."), lower(regexp_replace(col("c_name"), "#", ".")),
        lit("@alt.example"))).otherwise(lit("")),
    when(pmod(col("c_custkey"), lit(3)) =!= 0,
      concat(lit(" or +86-"),
        lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"),
        lit("-"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0")))
      .otherwise(lit("")))

  private val piiBaseSql: String =
    """'reach ' || c_name || ' via ' || lower(replace(c_name, '#', '.'))
       || '@mail.example'
       || CASE WHEN c_custkey % 5 = 0
            THEN ' cc backup.' || lower(replace(c_name, '#', '.')) || '@alt.example'
            ELSE '' END
       || CASE WHEN c_custkey % 3 <> 0
            THEN ' or +86-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
            ELSE '' END"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CCNet-style LM quality scoring: char-trigram model trained on the
    // English slice, every doc scored by mean conditional probability
    // (decimal-summed, log-free — see LmScore scaladoc) + OOV fraction.
    "q100_lm_quality" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = graft.operators.LmScore.trainTrigramModel(
        d.filter(col("lang") === "en"), col("text"))
      graft.operators.LmScore.scoreDocs(
          d.filter(length(col("text")) >= 3), col("doc_id"), col("text"), model)
        .withColumnRenamed("id", "doc_id")
    }),

    // TRUE-perplexity LM scoring: same trigram model as q100, but ranked
    // by mean log2 p (CCNet's actual semantics) via the fixed-point log2
    // kernel — integer exponent + shared mantissa table, so the oracle
    // replays the identical integers (Log2Fixed scaladoc has the algebra).
    "q102_lm_perplexity" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = graft.operators.LmScore.trainTrigramModel(
        d.filter(col("lang") === "en"), col("text"))
      graft.operators.LmScore.scoreDocsLog2(
          d.filter(length(col("text")) >= 3), col("doc_id"), col("text"), model)
        .withColumnRenamed("id", "doc_id")
    }),

    // Gopher repetition rules, per document: modal-2-gram share and
    // duplicate-3-gram fraction. ONE compiled tokenize pass per row
    // (RepetitionStats; the HOF forms remain the spec oracle) — still a
    // narrow map-side projection: no explode, no shuffle.
    "q69_repetition" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.RepetitionStats.expr(col("text"), 2, 3).as("r"))
        .select(col("doc_id"),
          col("r.top_frac").as("top2_frac"),
          col("r.dup_frac").as("dup3_frac"))
    }),

    // Benchmark decontamination stats: distinct-3-gram overlap of every
    // non-benchmark doc against the src0 "eval suite" (broadcast semi-join).
    "q70_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Contamination.overlapStats(
        d.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        d.filter(col("source") === "src0"), col("text"), k = 3)
    }),

    // Deterministic mixture weighting: per-source epoch weights (2.5 / 1 /
    // 0.5 / 0.25 by source index mod 4), copy counts as a pure function of
    // doc_id — the oracle recomputes the identical assignment.
    "q71_mixture_copies" -> ((s, dir) => {
      val weighted = docs(s, dir)
        .withColumn("__idx", substring(col("source"), 4, 10).cast("int"))
        .withColumn("weight",
          when(pmod(col("__idx"), lit(4)) === 0, 2.5)
            .when(pmod(col("__idx"), lit(4)) === 1, 1.0)
            .when(pmod(col("__idx"), lit(4)) === 2, 0.5)
            .otherwise(0.25))
      Mixture.assignCopies(weighted, col("doc_id"), col("weight"))
        .select(col("doc_id"), col("source"), col("n_copies"))
    }),

    // Int8 quantization summary per embedding: the quantized-sum is an
    // exact integer fingerprint of the codeword (floor(x*127/maxabs + .5)
    // is bit-deterministic in IEEE double across engines).
    "q72_embed_quantize" -> ((s, dir) => {
      emb(s, dir)
        .select(col("vec_id"), QuantizeStats.expr(col("embedding")).as("q"))
        .select(col("vec_id"),
          col("q.n_dims").as("n_dims"),
          round(col("q.maxabs"), 6).as("maxabs"),
          col("q.q_sum").as("q_sum"),
          col("q.n_sat").as("n_sat"))
    }),

    // Deterministic per-group quota sample: 10 docs per language by hash
    // order — compiles to WindowGroupLimit (only k rows/group cross the
    // exchange) and the oracle reproduces the exact same pick.
    "q78_quota_per_lang" -> ((s, dir) => {
      Sampling.kPerGroup(
          docs(s, dir).select(col("doc_id"), col("lang")),
          Seq(col("lang")), col("doc_id"), k = 10)
        .select(col("doc_id"), col("lang"))
    }),

    // Multimodal gate + frame fan-out, hash-gated: Spark actually SLICES
    // binary payloads (substr over BinaryType after the byte/dimension
    // gate), while the oracle reproduces every frame length by pure
    // arithmetic from byte_len — if they hash-match, the binary plumbing
    // implements its spec exactly.
    "q77_media_frames" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.fromDocuments(docs(s, dir))
      val valid = Multimodal.validMediaFilter(media, minBytes = 200, minDim = 50)
      Multimodal.sampleFrames(valid, frameBytes = 256, stride = 4)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_payload"))).cast("long").as("frame_bytes"))
    }),

    // RAG chunker: 200-char windows, 50-char overlap — the Dify pipeline's
    // chunker node as a deterministic generator (tail always covered).
    "q76_chunk_docs" -> ((s, dir) => {
      Chunker.fixedChunks(
          docs(s, dir).select(col("doc_id"), col("text")),
          col("text"), size = 200, overlap = 50)
        .select(col("doc_id"), col("chunk_idx"),
          col("chunk"), length(col("chunk")).as("chunk_len"))
    }),

    // PII scrub: deterministic synthetic contact blurbs (emails/phones
    // rendered from customer fields — the tables ship no real PII), then
    // regex redaction with typed placeholders. Both engines apply the
    // LITERAL same pattern strings (Java-regex ∩ RE2 syntax subset).
    "q74_pii_redact" -> ((s, dir) => {
      val base = piiBase
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          TextFunctions.redactPii(base).as("redacted"),
          TextFunctions.countMatches(base, TextFunctions.EmailRegex).as("n_emails"),
          TextFunctions.countMatches(base, TextFunctions.PhoneRegex).as("n_phones"))
    }),

    // Redaction edit-distance audit: character-level Levenshtein between
    // the raw PII-bearing text and its redacted form, per custkey bucket
    // — "how much surface does redaction touch" (a redactor that edits
    // 40% of characters is destroying context, one that edits 0% is
    // broken). Exact integers: both engines' levenshtein agree on this
    // ASCII surface; the CER ratio is micro-rounded.
    "q277_redaction_cer" -> ((s, dir) => {
      val base = piiBase
      Tables.load(s, dir, "customer")
        .select(pmod(col("c_custkey"), lit(4)).as("bucket"),
          base.as("__raw"),
          graft.functions.TextFunctions.redactPii(base).as("__red"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("__raw")).cast("long")).as("chars_total"),
          sum(levenshtein(col("__raw"), col("__red")).cast("long"))
            .as("edits_total"))
        .select(col("bucket"), col("n"), col("chars_total"),
          col("edits_total"),
          (graft.operators.EvalMetrics.microRound6(col("edits_total"),
            col("chars_total")).cast("double") / 1e6).as("cer"))
    }),

    // Exact temperature-mixture allocation (α = 0.5, Hamilton
    // apportionment) over the document sources: integer-sqrt weights,
    // floor quotas, leftovers to the largest remainders — Σ quota =
    // budget structurally, so the sampling schedule needs no float
    // reconciliation (the multilingual up-weighting rule of XLM-R/mT5
    // on the oracle surface).
    "q276_temperature_alloc" -> ((s, dir) =>
      Mixture.temperatureAllocationExact(docs(s, dir),
        Seq(col("source")), budget = 10000L)),

    // Gopher rule-based quality filter (Rae et al. §A1.1): word-count /
    // mean-word-length bounds, symbol-to-word ratio, alpha-word fraction,
    // stopword presence, bullet/ellipsis line ratios, combined keep flag.
    // One narrow projection — every signal recomputed exactly by the
    // oracle. minStopwords=1: this corpus's vocabulary carries one Gopher
    // stopword ("the"), so the paper's ≥2 would degenerate the flag.
    "q113_gopher_rules" -> ((s, dir) => {
      graft.operators.QualityRules.gopherQuality(
          docs(s, dir), col("doc_id"), col("text"), minStopwords = 1)
        .withColumnRenamed("id", "doc_id")
    }),

    // Gopher REPETITION rules (Rae et al. 2021 §A1.1 table A1, right
    // half — the companion of q113's word-level rules): duplicate-line
    // fractions + repeated-n-gram char fractions, per-row sort +
    // run-length folds, no shuffle. Docs are decorated with 4 repetition
    // modes (clean / dup sentences / bigram spam / repeated 5-gram) so
    // every signal fires; the oracle replays decoration and signals.
    "q203_repetition_rules" -> ((s, dir) => {
      val mode = pmod(col("doc_id"), lit(4))
      val decorated = concat(col("text"),
        when(mode === 1, repeat(lit(" repeat me please now."), 3))
          .when(mode === 2, concat(repeat(lit(" spam gram"), 8), lit(".")))
          .when(mode === 3, repeat(lit(" one two three four five."), 2))
          .otherwise(lit("")))
      val d = docs(s, dir).withColumn("__t", decorated)
      val sents = filter(
        transform(regexp_extract_all(col("__t"),
          lit("[^.!?]+(?:[.!?]+|$)"), lit(0)), x => trim(x)),
        x => x =!= "")
      graft.operators.QualityRules.repetitionSignals(
          d, col("doc_id"), col("__t"), sents)
        .withColumnRenamed("id", "doc_id")
    }),

    // Group-aware anti-leakage split: train/val/test as a FUNCTION of a
    // synthetic domain key (97 domains over the corpus) — the q204 row
    // ENCODES the no-leak property on the oracle surface: n_splits = 1
    // for every domain, with the full assignment replayed hash-for-hash.
    "q204_group_split" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("domain",
        concat(lit("site-"), pmod(col("doc_id"), lit(97)).cast("string"),
          lit(".com")))
      graft.operators.Sampling.groupAwareSplit(d, col("domain"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("split")).as("n_splits"),
          min(col("split")).as("split"))
    }),

    // Temperature-scaled multilingual sampling (XLM-R/mT5 balancing):
    // per-language weight ∝ n^0.5 normalized, quota = round(budget·w).
    // sqrt is correctly-rounded IEEE (pow is not) and the normalizer sums
    // decimals, so every double here is bit-identical in the oracle.
    "q117_temperature_mix" -> ((s, dir) => {
      graft.operators.Mixture.temperatureWeights(
          docs(s, dir), Seq(col("lang")), alpha = 0.5, budget = 1000)
        .select(col("lang"), col("n_docs"),
          round(col("weight"), 6).as("weight"), col("quota"))
    }),

    // Model-based quality scoring: fastText-shaped hashed-bag-of-words
    // linear classifier (poly31 token buckets, integer per-mille weights,
    // mean-pooled logit) — the CCNet/LLaMA-style model filter alongside
    // the rule-based (q113) and LM-based (q100/q102) gates. Seeded
    // weights keep the oracle closed-form (q47-vs-q94 pattern: the
    // trained-weights path takes an array and is spec-covered).
    "q136_quality_classifier" -> ((s, dir) => {
      graft.operators.QualityClassifier.score(
          docs(s, dir), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
    }),

    // Training-shard export assignments: deterministic corpus-wide
    // shuffle (Knuth-hash order, salt-decorrelated from the shard key) +
    // 16-way shard fan-out — the (shard, pos) every row would occupy in
    // the exported layout, fully replayed by the oracle.
    "q137_training_shards" -> ((s, dir) => {
      graft.operators.Export.shardAssignments(
          docs(s, dir).select(col("doc_id"), col("lang")),
          col("doc_id"), nShards = 16)
        .select(col("doc_id"), col("lang"), col("shard"), col("pos"))
    }),

    // DSIR data selection (Xie et al. 2023): hashed uni+bigram
    // log-likelihood ratio between the English target slice and the full
    // pool, fixed-point log2 end to end (Log2Fixed — the q102 kernel), so
    // the oracle replays every per-bucket delta and per-doc sum exactly.
    // Selection = deterministic top-100 (the paper's temperature→0 limit);
    // the engine's flag comes from a WindowGroupLimit-compiled quota +
    // one-row broadcast cutoff, never a full-pool sort — the oracle's
    // ROW_NUMBER form is the semantics, not the plan.
    "q161_dsir_selection" -> ((s, dir) => {
      import graft.operators.Dsir
      val d = docs(s, dir)
      val target = Dsir.bucketCounts(d.filter(col("lang") === "en"), col("text"))
      val raw = Dsir.bucketCounts(d, col("text"))
      val delta = Dsir.logRatioTable(target, raw)
      val scored = Dsir.importanceWeights(d, col("doc_id"), col("text"), delta)
      Dsir.selectQuota(scored, col("log_ratio"), col("doc_id"), quota = 100)
        .select(col("doc_id"), col("n_grams"), col("sum_fp"),
          col("log_ratio"), col("selected"))
    }),

    // Character-entropy quality signal: Shannon entropy of the codepoint
    // distribution per doc (binary-spill / mojibake / keyboard-mash
    // detector), in fixed-point log2 — one compiled map-side pass, every
    // intermediate an exact integer the oracle replays (q102 discipline).
    "q164_char_entropy" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), graft.functions.CharEntropy.expr(col("text")).as("e"))
        .select(col("doc_id"), col("e.n_chars").as("n_chars"),
          col("e.ent_fp").as("ent_fp"),
          when(col("e.n_chars") > 0,
            round(col("e.ent_fp") / (col("e.n_chars") * lit(1048576.0)), 6))
            .as("entropy_bits"))
    }),

    // BPE-with-a-trained-table token accounting: top-64 adjacent
    // codepoint pairs by corpus frequency (rank tie → pair asc), then a
    // single-rank greedy merge pass per word. The unit every training
    // budget keys off (packing, truncation, quotas) — q57's regex
    // tokenizer counts splits, this counts learned subwords. The oracle
    // retrains the table and replays every merge with a list_reduce fold.
    "q168_bpe_tokens" -> ((s, dir) => {
      import graft.operators.Bpe
      val d = docs(s, dir)
      val merges = Bpe.trainMerges(d, col("text"), m = 64)
      Bpe.tokenCounts(d, col("doc_id"), col("text"), merges)
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // token-count-proportional weights, 200-doc sample — the canonical
    // weighted-sample primitive next to the quota (q78) / temperature
    // (q117) / copy-count (q71) family. Key = log2fp(u)/w: integer log,
    // one cross-engine-exact division, oracle replays the full ranking.
    "q170_weighted_sample" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        (TextFunctions.tokenCount(col("text")) + 1).cast("long").as("w_permille"))
      graft.operators.Sampling.weightedSample(
          base, col("doc_id"), col("w_permille"), k = 200, keyCol = Some("wkey"))
        .select(col("doc_id"), col("w_permille"), round(col("wkey"), 6).as("wkey"))
    }),

    // Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995): the REAL
    // n-gram smoothing next to q100/q102's MLE model — absolute discount
    // 3/4 + continuation-probability backoff, every probability an exact
    // integer ratio scored through the fixed-point log2 kernel. Model on
    // the English slice (the q100 convention); non-English docs surface
    // as high oov_frac, fluent English ranks by mean_log2p.
    "q208_kn_lm" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = graft.operators.KneserNey.trainBigramModel(
        d.filter(col("lang") === "en"), col("text"))
      graft.operators.KneserNey.scoreDocs(d, col("doc_id"), col("text"), model)
    }),

    // Join-form decontamination (the beyond-broadcast notch of q70): the
    // benchmark gram set stays distributed, grams ride their 61-bit poly
    // hash through a gram-keyed shuffle join, and the Bloom prefilter
    // (bit array only on the driver) prunes the doc-side exchange while
    // n_sh still counts every distinct gram (pre-explode size). Stats
    // are value-identical to q70's broadcast form at any collision-free
    // scale (spec-pinned); the oracle replays the hashed-gram pipeline.
    "q211_contamination_join" -> ((s, dir) => {
      val d = docs(s, dir)
      Contamination.overlapStatsJoin(
        d.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        d.filter(col("source") === "src0"), col("text"), k = 3,
        bloomPrefilter = true)
    }),

    // Matryoshka truncation profile (MRL): per-label mean energy
    // fraction captured by the 8/16/32-dim prefixes of the 64-dim
    // embeddings — THE statistic consulted before truncating a corpus's
    // vectors to a cheaper dimension. Per-row energies are strict
    // left-fold double sums (identical fold order both engines), the
    // fractions round to 6dp, and the per-label mean rides DECIMAL
    // (order-invariant) — the q73 discipline.
    "q213_matryoshka_energy" -> ((s, dir) => {
      val v = col("embedding").cast("array<double>")
      def energy(d: Int) =
        aggregate(slice(v, 1, d), lit(0.0), (a, x) => a + x * x)
      // portable half-up rounding: floor(x·10^p + 0.5) over IDENTICAL
      // doubles both engines — never the engines' own ROUND, whose
      // half-boundary behavior diverges (the q136 lesson)
      def r6(c: org.apache.spark.sql.Column) =
        (floor(c * 1e6 + 0.5) / 1e6)
      def frac(d: Int) =
        when(col("e64") === 0.0, lit(0.0))
          .otherwise(r6(col(s"e$d") / col("e64")))
          .cast("decimal(18,9)")
      emb(s, dir)
        .select(col("label"), energy(8).as("e8"), energy(16).as("e16"),
          energy(32).as("e32"), energy(64).as("e64"))
        .select(col("label"), frac(8).as("f8"), frac(16).as("f16"),
          frac(32).as("f32"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          (floor(sum(col("f8")).cast("double") / count(lit(1)) * 1e4 + 0.5) / 1e4)
            .as("avg_f8"),
          (floor(sum(col("f16")).cast("double") / count(lit(1)) * 1e4 + 0.5) / 1e4)
            .as("avg_f16"),
          (floor(sum(col("f32")).cast("double") / count(lit(1)) * 1e4 + 0.5) / 1e4)
            .as("avg_f32"))
    }),

    // Tokenizer fertility per language: BPE tokens per whitespace word
    // under the q168 trained merge table — the statistic that shows
    // which languages a tokenizer under-serves (fertility ≈ 1000
    // permille = one token per word; higher = more splits). Exact floor
    // permille; the oracle retrains the table and replays every merge.
    "q214_tokenizer_fertility" -> ((s, dir) => {
      import graft.operators.Bpe
      val d = docs(s, dir)
      val merges = Bpe.trainMerges(d, col("text"), m = 64)
      val ft = col("sum_tokens") * 1000
      d.select(col("lang"),
          TextFunctions.tokenCount(col("text")).cast("long").as("nw"),
          graft.functions.BpeCount.expr(col("text"), merges)
            .getField("n_tokens").cast("long").as("nt"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("sum_words"),
          sum(col("nt")).as("sum_tokens"))
        .select(col("lang"), col("n_docs"), col("sum_words"),
          col("sum_tokens"),
          // exact floor division: remainder-subtract, then divide in
          // DECIMAL(38,0) — a double-backed `/` loses exactness past 2^53
          // (a 100 TB 'en' slice easily exceeds 9e12 tokens)
          ((ft - pmod(ft, col("sum_words"))).cast("decimal(38,0)") /
            col("sum_words")).cast("long").as("fertility_permille"))
    }),

    // Per-source KL divergence of token distributions vs the corpus —
    // the mixture diagnostic behind data-selection decisions (domain
    // shift / broken scrape shows as a KL spike). Fixed-point log2 end
    // to end: the per-source sum is an exact integer; only the final
    // display division is float (portable-half-up 6dp). The oracle
    // replays all four log tables and every term.
    "q219_source_kl" -> ((s, dir) => {
      graft.operators.Divergence.klBySource(
        docs(s, dir), col("source"), col("text"))
    }),

    // Per-label embedding norm profile. The per-row norm is cast to
    // DECIMAL(18,9) before summing so the aggregate is partition-order
    // invariant (double addition is not associative); the oracle sums the
    // same decimals.
    "q73_embed_norms" -> ((s, dir) => {
      emb(s, dir)
        .select(col("label"),
          L2Norm.expr(col("embedding")).cast("decimal(18,9)").as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("nrm")).cast("double") / count(lit(1)), 4).as("avg_norm"))
    }))

  private val toksSql =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
  private def gram2Sql(toks: String) =
    s"CASE WHEN len($toks) < 2 THEN [] ELSE " +
      s"list_transform(range(1, len($toks)), i -> $toks[i] || ' ' || $toks[i+1]) END"
  private def gram3Sql(toks: String) =
    s"CASE WHEN len($toks) < 3 THEN [] ELSE " +
      s"list_transform(range(1, len($toks)-1), i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]) END"

  private val shardOrderMultiplier: Long =
    ((BigInt(graft.operators.Sampling.Knuth) * 3) mod
      BigInt(graft.operators.Sampling.Prime)).toLong

  /** BPE merge-table training CTEs (adjacent-pair stream → top-64 by
    * (count desc, pair) → `ms` merge list) over a prior CTE `t` carrying
    * `toks` — the SQL twin of `Bpe.trainMerges`, shared by q168 and q214
    * so the two oracles and the kernel can never desynchronize.
    */
  private def bpeTrainCtesSql: String =
    """pw AS (SELECT unnest(flatten(list_transform(toks, w ->
             CASE WHEN length(w) >= 2
               THEN list_transform(range(1, length(w)), i -> substr(w, i, 2))
               ELSE [] END))) AS pair
           FROM t),
         cnt AS (SELECT pair, COUNT(*) AS n FROM pw GROUP BY 1),
         top AS (SELECT pair FROM (SELECT pair,
             ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rk FROM cnt)
           WHERE rk <= 64),
         ml AS (SELECT list(pair) AS ms FROM top)"""

  /** Greedy single-rank BPE token count of `toks` under the `ms` merge
    * list — the list_reduce state-machine twin of `BpeCount` (COALESCE'd
    * to 0, uncast; callers pick the output width).
    */
  private def bpeTokensSql: String =
    """COALESCE(list_sum(list_transform(toks, w ->
               list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, length(w) + 1)),
                 (acc, i) -> CASE
                   WHEN acc % 2 = 1 THEN (acc // 2) * 2
                   WHEN i < length(w) AND list_contains(ms, substr(w, i, 2))
                     THEN (acc // 2 + 1) * 2 + 1
                   ELSE (acc // 2 + 1) * 2 END) // 2)), 0)"""

  /** Unigram + bigram poly31 hash list of `toks` — the SQL mirror of
    * DsirScore's gram fold (PolyGramHashes k=1 ++ k=2).
    */
  private def dsirGramsSql(toks: String): String =
    s"list_concat(" +
      s"list_transform($toks, tk -> ${CurationQueries.polyHashSqlLine("tk")}), " +
      s"CASE WHEN len($toks) < 2 THEN CAST([] AS BIGINT[]) ELSE " +
      s"list_transform(range(1, len($toks)), i -> " +
      s"${CurationQueries.polyHashSqlLine(s"($toks[i] || ' ' || $toks[i+1])")}) END)"

  /** The q113 Gopher signal CTE, parameterized by the input CTE name
    * (which must expose doc_id, text, toks, lns) and the output CTE name
    * — shared with q221/q224's oracles so the rule thresholds live in
    * exactly one SQL body. */
  private[queries] def gopherSignalsCte(t: String, out: String): String =
    s"""$out AS (SELECT doc_id,
             len(toks) AS nw,
             CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                 / len(toks) END AS mwl,
             CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks)
               END AS fa,
             CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
                 / len(toks) END AS sym,
             CASE WHEN len(lns) = 0 THEN 0.0
               ELSE CAST(len(list_filter(lns,
                 l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) / len(lns)
               END AS bf,
             CASE WHEN len(lns) = 0 THEN 0.0
               ELSE CAST(len(list_filter(lns,
                 l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$$$$'))) AS DOUBLE)
                 / len(lns) END AS ef,
             len(list_intersect(list_distinct(list_transform(toks, x -> lower(x))),
               ['the','be','to','of','and','that','have','with'])) AS nstop
           FROM $t)"""

  /** The q113 keep verdict over [[gopherSignalsCte]]'s signal columns
    * (minStopwords=1 — this corpus's calibration). */
  private[queries] val gopherKeepCaseSql: String =
    """CASE WHEN nw BETWEEN 50 AND 100000
             AND mwl BETWEEN 3.0 AND 10.0 AND sym <= 0.1 AND fa >= 0.8
             AND nstop >= 1 AND bf <= 0.9 AND ef <= 0.3
             THEN 1 ELSE 0 END"""

  /** The q136 hashed-classifier per-doc weight sums, parameterized by the
    * input CTE name (exposing doc_id, toks) and the output CTE name —
    * shared with q221/q224's oracles. */
  private[queries] def classifierSumsCte(t: String, out: String): String =
    s"""$out AS (SELECT doc_id, len(toks) AS n_tokens,
             list_sum(list_transform(toks, tk ->
               ((${CurationQueries.polyHashSqlLine("tk")} % 4096)
                 * 2654435761) % 2147483647 % 2001 - 1000)) AS sumw
           FROM $t)"""

  val oracles: Map[String, String] = Map(
    "q170_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, len($toksSql) + 1 AS w FROM documents),
         h AS (SELECT doc_id, w,
             ((doc_id % 2147483647) * 2654435761) % 2147483647 % 1048576 + 1
               AS m
           FROM t),
         ${graft.functions.Log2Fixed.lutCteSql},
         ${CurationQueries.log2fpStages("h", "doc_id, w", "m", "lg", "p")},
         k AS (SELECT doc_id, w,
             CAST(lg - 20971520 AS DOUBLE) / w AS wkey
           FROM pl),
         r AS (SELECT doc_id, w, wkey,
             ROW_NUMBER() OVER (ORDER BY wkey DESC, doc_id) AS rk
           FROM k)
         SELECT doc_id, CAST(w AS BIGINT) AS w_permille,
           ROUND(wkey, 6) AS wkey
         FROM r WHERE rk <= 200""",
    "q168_bpe_tokens" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         $bpeTrainCtesSql,
         sc AS (SELECT doc_id,
             CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
               AS INT) AS n_chars,
             CAST($bpeTokensSql AS INT) AS n_tokens
           FROM t CROSS JOIN ml)
         SELECT doc_id, n_chars, n_tokens, n_chars - n_tokens AS n_merges
         FROM sc""",
    "q164_char_entropy" ->
      s"""WITH ch AS (SELECT doc_id,
             unnest(list_transform(string_split(text, ''), c -> ord(c))) AS cp
           FROM documents WHERE length(text) > 0),
         cnt AS (SELECT doc_id, cp, CAST(COUNT(*) AS BIGINT) AS n
           FROM ch GROUP BY 1, 2),
         tot AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS nn
           FROM cnt GROUP BY 1),
         ${graft.functions.Log2Fixed.lutCteSql},
         ${CurationQueries.log2fpStages("cnt", "doc_id, cp", "n", "lgc", "pc")},
         ${CurationQueries.log2fpStages("tot", "doc_id", "nn", "lgn", "pn")},
         s AS (SELECT c.doc_id, SUM(c.n * (pnl.lgn - pcl.lgc)) AS ent
           FROM cnt c
           JOIN pcl ON c.doc_id = pcl.doc_id AND c.cp = pcl.cp
           JOIN pnl ON c.doc_id = pnl.doc_id
           GROUP BY 1)
         SELECT d.doc_id, CAST(COALESCE(tot.nn, 0) AS INT) AS n_chars,
           CAST(COALESCE(s.ent, 0) AS BIGINT) AS ent_fp,
           CASE WHEN COALESCE(tot.nn, 0) > 0 THEN
             ROUND(CAST(s.ent AS DOUBLE) / (tot.nn * 1048576.0), 6) END
             AS entropy_bits
         FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN s USING (doc_id)""",
    "q161_dsir_selection" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         ex AS (SELECT doc_id, lang, unnest(${dsirGramsSql("toks")}) % 4096 AS b
           FROM t),
         tcn AS (SELECT b, COUNT(*) AS n FROM ex WHERE lang = 'en' GROUP BY 1),
         rcn AS (SELECT b, COUNT(*) AS n FROM ex GROUP BY 1),
         bk AS (SELECT unnest(range(0, 4096)) AS b),
         cnt AS (SELECT bk.b, COALESCE(tcn.n, 0) + 1 AS tn,
             COALESCE(rcn.n, 0) + 1 AS rn
           FROM bk LEFT JOIN tcn ON bk.b = tcn.b LEFT JOIN rcn ON bk.b = rcn.b),
         ${graft.functions.Log2Fixed.lutCteSql},
         ${CurationQueries.log2fpStages("cnt", "b", "tn", "lgt", "pt")},
         ${CurationQueries.log2fpStages("cnt", "b", "rn", "lgr", "pr")},
         tot AS (SELECT 1 AS k,
             (SELECT COALESCE(SUM(n), 0) FROM tcn) + 4096 AS nt,
             (SELECT COALESCE(SUM(n), 0) FROM rcn) + 4096 AS nr),
         ${CurationQueries.log2fpStages("tot", "k, nr", "nt", "lgnt", "qt")},
         ${CurationQueries.log2fpStages("qtl", "k, lgnt", "nr", "lgnr", "qr")},
         delta AS (SELECT ptl.b,
             (ptl.lgt - qrl.lgnt) - (prl.lgr - qrl.lgnr) AS d
           FROM ptl JOIN prl ON ptl.b = prl.b CROSS JOIN qrl),
         sm AS (SELECT ex.doc_id, SUM(delta.d) AS sum_fp
           FROM ex JOIN delta ON ex.b = delta.b GROUP BY 1),
         r AS (SELECT t.doc_id,
             CAST(CASE WHEN len(toks) = 0 THEN 0 ELSE 2 * len(toks) - 1 END
               AS INT) AS n_grams,
             CAST(COALESCE(sm.sum_fp, 0) AS BIGINT) AS sum_fp,
             CASE WHEN len(toks) > 0 THEN
               ROUND(CAST(COALESCE(sm.sum_fp, 0) AS DOUBLE)
                 / ((2 * len(toks) - 1) * 1048576.0), 6) END AS log_ratio
           FROM t LEFT JOIN sm USING (doc_id)),
         rk AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY log_ratio DESC, doc_id) AS rn2
           FROM r WHERE log_ratio IS NOT NULL)
         SELECT r.doc_id, r.n_grams, r.sum_fp, r.log_ratio,
           CAST(CASE WHEN rk.rn2 IS NOT NULL AND rk.rn2 <= 100
             THEN 1 ELSE 0 END AS INT) AS selected
         FROM r LEFT JOIN rk USING (doc_id)""",
    "q137_training_shards" ->
      s"""WITH a AS (SELECT doc_id, lang,
             ((doc_id % 2147483647) * 2654435761) % 2147483647 % 16 AS shard,
             ((doc_id % 2147483647) * $shardOrderMultiplier)
               % 2147483647 % 1073741824 AS okey
           FROM documents)
         SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
             ORDER BY okey, doc_id) AS INT) AS pos
         FROM a""",
    "q136_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         ${classifierSumsCte("t", "s")}
         SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           -- exact integer micro-unit rounding, half away from zero: ROUND
           -- on the double quotient diverges at representation boundaries
           -- (sf0.1 sweep); // floors for the non-negative operands here
           CASE WHEN n_tokens > 0 THEN
             CAST((CASE WHEN sumw < 0 THEN -1 ELSE 1 END) *
               ((2 * ABS(sumw) * 1000 + n_tokens) // (2 * n_tokens))
               AS DOUBLE) / 1000000.0
           END AS logit,
           CAST(CASE WHEN n_tokens > 0 AND sumw > 0 THEN 1 ELSE 0 END
             AS INT) AS keep
         FROM s""",
    "q117_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         t AS (SELECT SUM(CAST(SQRT(CAST(n AS DOUBLE)) AS DECIMAL(28,12))) AS z
           FROM c)
         SELECT lang, CAST(n AS BIGINT) AS n_docs,
           ROUND(SQRT(CAST(n AS DOUBLE)) / CAST(z AS DOUBLE), 6) AS weight,
           CAST(ROUND(SQRT(CAST(n AS DOUBLE)) / CAST(z AS DOUBLE) * 1000, 0)
             AS BIGINT) AS quota
         FROM c, t""",
    "q204_group_split" ->
      s"""WITH d AS (SELECT doc_id,
             'site-' || CAST(doc_id % 97 AS VARCHAR) || '.com' AS domain
           FROM documents),
         h AS (SELECT doc_id, domain,
             ${CurationQueries.polyHashSqlLine("domain")} AS hv
           FROM d),
         b AS (SELECT doc_id, domain,
             ((hv % 2147483647) * 506952114) % 2147483647 % 100 AS bucket
           FROM h),
         s AS (SELECT domain,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
           FROM b)
         SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
           MIN(split) AS split
         FROM s GROUP BY domain""",
    "q203_repetition_rules" ->
      s"""WITH t AS (SELECT doc_id, text || CASE doc_id % 4
             WHEN 1 THEN repeat(' repeat me please now.', 3)
             WHEN 2 THEN repeat(' spam gram', 8) || '.'
             WHEN 3 THEN repeat(' one two three four five.', 2)
             ELSE '' END AS text
           FROM documents),
         x AS (SELECT doc_id, text, $toksSql AS toks,
             list_filter(list_transform(
               regexp_extract_all(text, '[^.!?]+(?:[.!?]+|$$)'),
               l -> trim(l)), l -> l <> '') AS lns
           FROM t),
         g AS (SELECT doc_id, lns,
             CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])
               ELSE CAST([] AS VARCHAR[]) END AS g2,
             CASE WHEN len(toks) >= 5
               THEN list_transform(range(1, len(toks)-3),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      || ' ' || toks[i+3] || ' ' || toks[i+4])
               ELSE CAST([] AS VARCHAR[]) END AS g5,
             length(array_to_string(toks, ' ')) AS jl,
             COALESCE(list_sum(list_transform(lns, l -> length(l))), 0) AS lc
           FROM x),
         s AS (SELECT doc_id, len(lns) AS nl, lc, jl,
             CASE WHEN len(lns) = 0 THEN 0.0
               ELSE CAST(len(lns) - len(list_distinct(lns)) AS DOUBLE)
                 / len(lns) END AS dlf,
             CASE WHEN lc = 0 THEN 0.0
               ELSE CAST(COALESCE(list_sum(list_transform(list_distinct(lns),
                 l -> (len(list_filter(lns, y -> y = l)) - 1) * length(l))), 0)
                 AS DOUBLE) / lc END AS dlcf,
             CASE WHEN len(g2) = 0 OR jl = 0 THEN 0.0
               ELSE CAST(
                 list_max(list_transform(list_distinct(g2),
                   v -> len(list_filter(g2, y -> y = v)))) *
                 length(list_min(list_filter(list_distinct(g2),
                   v -> len(list_filter(g2, y -> y = v)) =
                     list_max(list_transform(list_distinct(g2),
                       w -> len(list_filter(g2, y -> y = w)))))))
                 AS DOUBLE) / jl END AS tgf,
             CASE WHEN len(g5) = 0 OR jl = 0 THEN 0.0
               ELSE least(1.0,
                 CAST(COALESCE(list_sum(list_transform(list_distinct(g5),
                   v -> CASE WHEN len(list_filter(g5, y -> y = v)) > 1
                     THEN len(list_filter(g5, y -> y = v)) * length(v)
                     ELSE 0 END)), 0) AS DOUBLE) / jl) END AS dgf
           FROM g)
         SELECT doc_id, CAST(nl AS INT) AS n_lines,
           dlf AS dup_line_frac, dlcf AS dup_line_char_frac,
           tgf AS top_gram_char_frac, dgf AS dup_gram_char_frac,
           (dlf <= 0.30 AND dlcf <= 0.20 AND tgf <= 0.20 AND dgf <= 0.15)
             AS keep_repetition
         FROM s""",
    "q113_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks,
             string_split(text, chr(10)) AS lns
           FROM documents),
         ${gopherSignalsCte("t", "s")}
         SELECT doc_id, CAST(nw AS INT) AS n_words,
           ROUND(mwl, 4) AS mean_word_len, ROUND(fa, 4) AS frac_alpha,
           ROUND(sym, 4) AS symbol_ratio, ROUND(bf, 4) AS bullet_frac,
           ROUND(ef, 4) AS ellipsis_frac, CAST(nstop AS INT) AS n_stopwords,
           CAST($gopherKeepCaseSql AS INT) AS keep_doc
         FROM s""",
    "q100_lm_quality" ->
      """WITH codes AS (SELECT doc_id, lang,
             list_transform(string_split(text, ''),
               c -> CAST(ord(c) AS BIGINT)) AS cs
           FROM documents),
         rt AS (SELECT unnest(list_transform(
             range(1, GREATEST(len(cs) - 1, 1)),
             i -> {'h3': (((cs[i] * 31 + cs[i+1]) % 1000000007) * 31
                     + cs[i+2]) % 1000000007,
                   'h2': (cs[i] * 31 + cs[i+1]) % 1000000007})) AS t
           FROM codes WHERE lang = 'en'),
         tcnt AS (SELECT t.h3 AS h3, COUNT(*) AS n_tri, MIN(t.h2) AS h2
           FROM rt GROUP BY 1),
         bcnt AS (SELECT h2, SUM(n_tri) AS n_bi FROM tcnt GROUP BY 1),
         model AS (SELECT h3, n_tri, n_bi FROM tcnt JOIN bcnt USING (h2)),
         dt AS (SELECT doc_id, unnest(list_transform(
             range(1, len(cs) - 1),
             i -> (((cs[i] * 31 + cs[i+1]) % 1000000007) * 31
                     + cs[i+2]) % 1000000007)) AS h3
           FROM codes WHERE len(cs) >= 3),
         j AS (SELECT dt.doc_id,
             CASE WHEN m.h3 IS NULL THEN NULL ELSE
               CAST(CAST(m.n_tri AS DOUBLE) / CAST(m.n_bi AS DOUBLE)
                 AS DECIMAL(18,9)) END AS p
           FROM dt LEFT JOIN model m ON dt.h3 = m.h3),
         a AS (SELECT doc_id, COUNT(*) AS n,
             SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS n_oov,
             COALESCE(SUM(p), 0) AS sum_p
           FROM j GROUP BY 1)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tri,
           ROUND(CAST(n_oov AS DOUBLE) / n, 4) AS oov_frac,
           ROUND(CAST(sum_p AS DOUBLE) / n, 6) AS mean_p
         FROM a""",
    "q102_lm_perplexity" ->
      s"""WITH codes AS (SELECT doc_id, lang,
             list_transform(string_split(text, ''),
               c -> CAST(ord(c) AS BIGINT)) AS cs
           FROM documents),
         rt AS (SELECT unnest(list_transform(
             range(1, GREATEST(len(cs) - 1, 1)),
             i -> {'h3': (((cs[i] * 31 + cs[i+1]) % 1000000007) * 31
                     + cs[i+2]) % 1000000007,
                   'h2': (cs[i] * 31 + cs[i+1]) % 1000000007})) AS t
           FROM codes WHERE lang = 'en'),
         tcnt AS (SELECT t.h3 AS h3, COUNT(*) AS n_tri, MIN(t.h2) AS h2
           FROM rt GROUP BY 1),
         bcnt AS (SELECT h2, SUM(n_tri) AS n_bi FROM tcnt GROUP BY 1),
         model AS (SELECT h3, n_tri, n_bi FROM tcnt JOIN bcnt USING (h2)),
         ${graft.functions.Log2Fixed.lutCteSql},
         ml AS (SELECT h3, n_tri, n_bi,
             length(bin(n_tri)) - 1 AS et, length(bin(n_bi)) - 1 AS eb
           FROM model),
         mt AS (SELECT h3, et, eb,
             CASE WHEN et >= 20 THEN n_tri // CAST(POWER(2, et - 20) AS BIGINT)
                  ELSE n_tri * CAST(POWER(2, 20 - et) AS BIGINT)
             END - 1048576 AS tt,
             CASE WHEN eb >= 20 THEN n_bi // CAST(POWER(2, eb - 20) AS BIGINT)
                  ELSE n_bi * CAST(POWER(2, 20 - eb) AS BIGINT)
             END - 1048576 AS tb
           FROM ml),
         mf AS (SELECT mt.h3,
             (et * 1048576 + a.v + (a.vn - a.v) * (tt % 1024) // 1024)
             - (eb * 1048576 + b.v + (b.vn - b.v) * (tb % 1024) // 1024) AS lg
           FROM mt JOIN l2 a ON a.i = tt // 1024
                   JOIN l2 b ON b.i = tb // 1024),
         dt AS (SELECT doc_id, unnest(list_transform(
             range(1, len(cs) - 1),
             i -> (((cs[i] * 31 + cs[i+1]) % 1000000007) * 31
                     + cs[i+2]) % 1000000007)) AS h3
           FROM codes WHERE len(cs) >= 3),
         j AS (SELECT dt.doc_id, mf.lg
           FROM dt LEFT JOIN mf ON dt.h3 = mf.h3),
         agg AS (SELECT doc_id, COUNT(*) AS n,
             SUM(CASE WHEN lg IS NULL THEN 1 ELSE 0 END) AS n_oov,
             COALESCE(SUM(lg), 0) AS sum_lg
           FROM j GROUP BY 1)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tri,
           ROUND(CAST(n_oov AS DOUBLE) / n, 4) AS oov_frac,
           CASE WHEN n > n_oov
             THEN ROUND(CAST(sum_lg AS DOUBLE) / ((n - n_oov) * 1048576.0), 6)
             ELSE NULL END AS mean_log2p
         FROM agg""",
    "q69_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         g2 AS (SELECT doc_id, ${gram2Sql("toks")} AS gs FROM t),
         ex AS (SELECT doc_id, unnest(gs) AS g FROM g2),
         cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM ex GROUP BY 1, 2),
         top AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS n2 FROM cnt GROUP BY 1),
         g3 AS (SELECT doc_id, ${gram3Sql("toks")} AS gs FROM t),
         d3 AS (SELECT doc_id, len(gs) AS n3, len(list_distinct(gs)) AS nd3 FROM g3)
         SELECT t.doc_id,
           COALESCE(ROUND(top.topc / CAST(top.n2 AS DOUBLE), 6), 0.0) AS top2_frac,
           CASE WHEN d3.n3 = 0 THEN 0.0
                ELSE ROUND(1.0 - d3.nd3 / CAST(d3.n3 AS DOUBLE), 6) END AS dup3_frac
         FROM t LEFT JOIN top USING (doc_id) JOIN d3 USING (doc_id)""",
    "q70_contamination" ->
      s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         sh AS (SELECT doc_id, source, list_distinct(${gram3Sql("toks")}) AS s FROM t),
         bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE source = 'src0'),
         d AS (SELECT doc_id, len(s) AS n_sh, s FROM sh WHERE source <> 'src0'),
         ex AS (SELECT doc_id, unnest(s) AS g FROM d),
         hit AS (SELECT doc_id, COUNT(*) AS n_hit FROM ex JOIN bench USING (g) GROUP BY 1)
         SELECT d.doc_id, d.n_sh, COALESCE(hit.n_hit, 0) AS n_hit,
           CASE WHEN d.n_sh = 0 THEN 0.0
                ELSE ROUND(COALESCE(hit.n_hit, 0) / CAST(d.n_sh AS DOUBLE), 6) END
             AS contam_frac
         FROM d LEFT JOIN hit USING (doc_id)""",
    "q71_mixture_copies" ->
      """WITH w AS (SELECT doc_id, source,
             CASE CAST(SUBSTR(source, 4) AS INT) % 4
               WHEN 0 THEN 2.5 WHEN 1 THEN 1.0 WHEN 2 THEN 0.5
               ELSE 0.25 END AS wt,
             ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10000 AS bucket
           FROM documents)
         SELECT doc_id, source,
           CAST(FLOOR(wt) AS BIGINT) +
             (CASE WHEN bucket < ROUND((wt - FLOOR(wt)) * 10000) THEN 1 ELSE 0 END)
             AS n_copies
         FROM w""",
    "q72_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         m AS (SELECT vec_id, v, len(v) AS n_dims,
             COALESCE(list_max(list_transform(v, x -> abs(x))), 0.0) AS maxabs
           FROM e),
         q AS (SELECT vec_id, n_dims, maxabs,
             CASE WHEN maxabs = 0 THEN []
                  ELSE list_transform(v, x -> CAST(FLOOR(x * 127.0 / maxabs + 0.5) AS BIGINT))
             END AS qs
           FROM m)
         SELECT vec_id, n_dims, ROUND(maxabs, 6) AS maxabs,
           COALESCE(CAST(list_sum(qs) AS BIGINT), 0) AS q_sum,
           len(list_filter(qs, x -> x = 127 OR x = -127)) AS n_sat
         FROM q""",
    "q78_quota_per_lang" ->
      """WITH b AS (SELECT doc_id, lang,
             ((doc_id % 2147483647) * 2654435761) % 2147483647 % 1048576 AS bk
           FROM documents),
         r AS (SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bk, doc_id) AS rk
           FROM b)
         SELECT doc_id, lang FROM r WHERE rk <= 10""",
    "q77_media_frames" ->
      """WITH m AS (SELECT doc_id AS media_id,
             octet_length(encode(text)) AS byte_len,
             doc_id % 100 + 20 AS width, doc_id % 80 + 20 AS height
           FROM documents),
         v AS (SELECT * FROM m
           WHERE byte_len >= 200 AND width >= 50 AND height >= 50),
         f AS (SELECT media_id, byte_len,
             unnest(range(0, GREATEST(1, byte_len // 1024))) AS i
           FROM v)
         SELECT media_id, COUNT(*) AS n_frames,
           CAST(SUM(LEAST(256, byte_len - 1024 * i)) AS BIGINT) AS frame_bytes
         FROM f GROUP BY 1""",
    "q76_chunk_docs" ->
      """WITH t AS (SELECT doc_id, text,
             GREATEST(0, (LENGTH(text) - 200 + 149) // 150) AS k
           FROM documents),
         u AS (SELECT doc_id, text, unnest(range(0, k + 1)) AS chunk_idx FROM t)
         SELECT doc_id, chunk_idx,
           substr(text, CAST(chunk_idx AS INT) * 150 + 1, 200) AS chunk,
           LENGTH(substr(text, CAST(chunk_idx AS INT) * 150 + 1, 200)) AS chunk_len
         FROM u""",
    "q74_pii_redact" ->
      s"""WITH t AS (SELECT c_custkey, $piiBaseSql AS txt
           FROM customer)
         SELECT c_custkey,
           regexp_replace(regexp_replace(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted,
           len(regexp_extract_all(txt,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(txt,
             '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS n_phones
         FROM t""",

    "q277_redaction_cer" ->
      s"""WITH t AS (SELECT c_custkey % 4 AS bucket, $piiBaseSql AS txt
           FROM customer),
         r AS (SELECT bucket, txt,
             regexp_replace(regexp_replace(txt,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '[EMAIL]', 'g'),
               '\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS red
           FROM t),
         a AS (SELECT bucket, COUNT(*) AS n,
             CAST(SUM(length(txt)) AS BIGINT) AS chars_total,
             CAST(SUM(levenshtein(txt, red)) AS BIGINT) AS edits_total
           FROM r GROUP BY 1)
         SELECT bucket, n, chars_total, edits_total,
           CAST((2 * CAST(edits_total AS HUGEINT) * 1000000 + chars_total)
             // (2 * CAST(chars_total AS HUGEINT)) AS BIGINT) / 1000000.0
             AS cer
         FROM a""",

    "q276_temperature_alloc" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents
           GROUP BY 1),
         w0 AS (SELECT source, n_docs,
             CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
               AS s0,
             CAST(n_docs AS HUGEINT) * 1000000000000 AS v
           FROM c),
         w1 AS (SELECT source, n_docs,
             CASE WHEN CAST(s0 + 2 AS HUGEINT) * (s0 + 2) <= v THEN s0 + 2
                  WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= v THEN s0 + 1
                  WHEN CAST(s0 AS HUGEINT) * s0 <= v THEN s0
                  WHEN CAST(s0 - 1 AS HUGEINT) * (s0 - 1) <= v THEN s0 - 1
                  ELSE s0 - 2 END AS w_sqrt
           FROM w0),
         z AS (SELECT CAST(SUM(w_sqrt) AS HUGEINT) AS ww FROM w1),
         a AS (SELECT source, n_docs, w_sqrt,
             CASE WHEN ww > 0
               THEN (CAST(w_sqrt AS HUGEINT) * 10000) // ww
               ELSE 0 END AS base_quota,
             CASE WHEN ww > 0
               THEN (CAST(w_sqrt AS HUGEINT) * 10000) % ww
               ELSE 0 END AS rem
           FROM w1, z),
         r AS (SELECT a.source, a.n_docs, a.w_sqrt, a.base_quota, a.rem,
             (SELECT COUNT(*) FROM a b WHERE b.rem > a.rem
               OR (b.rem = a.rem AND b.source < a.source)) AS ahead
           FROM a),
         l AS (SELECT 10000 - CAST(SUM(base_quota) AS BIGINT) AS lo FROM a)
         SELECT source, n_docs, CAST(w_sqrt AS BIGINT) AS w_sqrt,
           CAST(base_quota AS BIGINT) AS base_quota,
           CAST(base_quota + CASE WHEN ahead < lo THEN 1 ELSE 0 END
             AS BIGINT) AS quota,
           CAST((2 * (base_quota + CASE WHEN ahead < lo THEN 1 ELSE 0 END)
             * 1000000 + 10000) // (2 * 10000) AS BIGINT) / 1000000.0
             AS share
         FROM r, l""",
    "q219_source_kl" ->
      s"""WITH tk AS (SELECT source,
             list_transform($toksSql,
               tk -> ${CurationQueries.polyHashSqlLine("tk")}) AS hs
           FROM documents),
         hx AS (SELECT source, unnest(hs) AS h FROM tk),
         cs AS (SELECT source, h, COUNT(*) AS c_sw FROM hx GROUP BY 1, 2),
         cg AS (SELECT h, CAST(SUM(c_sw) AS BIGINT) AS c_gw
           FROM cs GROUP BY 1),
         ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
             COUNT(*) AS n_vocab FROM cs GROUP BY 1),
         ng AS (SELECT CAST(SUM(c_sw) AS BIGINT) AS n_g FROM cs),
         ${graft.functions.Log2Fixed.lutCteSql},
         ${CurationQueries.log2fpStages("cs", "source, h, c_sw", "c_sw",
        "lg_sw", "a")},
         ${CurationQueries.log2fpStages("cg", "h", "c_gw", "lg_gw", "b")},
         ${CurationQueries.log2fpStages("ns", "source, n_s, n_vocab", "n_s",
        "lg_ns", "c")},
         ${CurationQueries.log2fpStages("ng", "n_g", "n_g", "lg_ng", "d")},
         j AS (SELECT al.source, al.c_sw,
             al.lg_sw, bl.lg_gw, cl.lg_ns, cl.n_s, cl.n_vocab, dl.lg_ng
           FROM al JOIN bl ON al.h = bl.h
             JOIN cl ON al.source = cl.source
             CROSS JOIN dl),
         t2 AS (SELECT source, n_s, n_vocab,
             SUM(c_sw * (lg_sw + lg_ng - lg_gw - lg_ns)) AS s
           FROM j GROUP BY 1, 2, 3)
         SELECT source, n_s AS n_tokens, CAST(n_vocab AS BIGINT) AS n_vocab,
           FLOOR(CAST(s AS DOUBLE) / (n_s * 1048576e0) * 1e6 + 0.5) / 1e6
             AS kl_bits
         FROM t2""",
    "q213_matryoshka_energy" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
         en AS (SELECT label,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v[1:8]),
               (a, x) -> a + x*x) AS e8,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v[1:16]),
               (a, x) -> a + x*x) AS e16,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v[1:32]),
               (a, x) -> a + x*x) AS e32,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v[1:64]),
               (a, x) -> a + x*x) AS e64
           FROM e),
         fr AS (SELECT label,
             CAST(CASE WHEN e64 = 0.0 THEN 0.0
               ELSE FLOOR(e8 / e64 * 1e6 + 0.5) / 1e6 END
               AS DECIMAL(18,9)) AS f8,
             CAST(CASE WHEN e64 = 0.0 THEN 0.0
               ELSE FLOOR(e16 / e64 * 1e6 + 0.5) / 1e6 END
               AS DECIMAL(18,9)) AS f16,
             CAST(CASE WHEN e64 = 0.0 THEN 0.0
               ELSE FLOOR(e32 / e64 * 1e6 + 0.5) / 1e6 END
               AS DECIMAL(18,9)) AS f32
           FROM en)
         SELECT label, COUNT(*) AS n,
           FLOOR(CAST(SUM(f8) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4 AS avg_f8,
           FLOOR(CAST(SUM(f16) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4 AS avg_f16,
           FLOOR(CAST(SUM(f32) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4 AS avg_f32
         FROM fr GROUP BY label""",
    "q214_tokenizer_fertility" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         $bpeTrainCtesSql,
         sc AS (SELECT lang, len(toks) AS nw,
             CAST($bpeTokensSql AS BIGINT) AS nt
           FROM t CROSS JOIN ml)
         SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nw) AS BIGINT) AS sum_words,
           CAST(SUM(nt) AS BIGINT) AS sum_tokens,
           CAST((SUM(nt) * 1000) // SUM(nw) AS BIGINT) AS fertility_permille
         FROM sc GROUP BY lang""",
    "q208_kn_lm" ->
      s"""WITH tk AS (SELECT doc_id, lang,
             list_transform($toksSql,
               tk -> ${CurationQueries.polyHashSqlLine("tk")}) AS hs
           FROM documents),
         pr AS (SELECT doc_id, lang,
             CASE WHEN len(hs) < 2 THEN CAST([] AS BIGINT[])
               ELSE list_transform(range(1, len(hs)),
                 i -> hs[i] * 1073741824 + hs[i+1]) END AS ps
           FROM tk),
         rp AS (SELECT unnest(ps) AS vw FROM pr WHERE lang = 'en'),
         big AS (SELECT vw, COUNT(*) AS c_vw, vw // 1073741824 AS v,
             vw % 1073741824 AS w
           FROM rp GROUP BY 1),
         ctx AS (SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v,
             COUNT(*) AS n1_v FROM big GROUP BY 1),
         cont AS (SELECT w, COUNT(*) AS n1_w FROM big GROUP BY 1),
         npp AS (SELECT COUNT(*) AS n_pp FROM big),
         dd AS (SELECT doc_id, vw, vw // 1073741824 AS v,
             vw % 1073741824 AS w
           FROM (SELECT doc_id, unnest(ps) AS vw FROM pr)),
         jj AS (SELECT dd.doc_id,
             CASE WHEN c.c_v IS NULL OR k.n1_w IS NULL THEN 1 ELSE 0 END AS oov,
             COALESCE(b.c_vw * 4 - 3, 0) * n.n_pp + 3 * c.n1_v * k.n1_w AS num,
             4 * c.c_v * n.n_pp AS den
           FROM dd LEFT JOIN big b ON dd.vw = b.vw
             LEFT JOIN ctx c ON dd.v = c.v
             LEFT JOIN cont k ON dd.w = k.w
             CROSS JOIN npp n),
         ${graft.functions.Log2Fixed.lutCteSql},
         x AS (SELECT doc_id, oov, num, den,
             length(bin(num)) - 1 AS en, length(bin(den)) - 1 AS ed FROM jj),
         t2 AS (SELECT doc_id, oov, en, ed,
             CASE WHEN en >= 20 THEN num // CAST(POWER(2, en - 20) AS BIGINT)
                  ELSE num * CAST(POWER(2, 20 - en) AS BIGINT)
             END - 1048576 AS tn,
             CASE WHEN ed >= 20 THEN den // CAST(POWER(2, ed - 20) AS BIGINT)
                  ELSE den * CAST(POWER(2, 20 - ed) AS BIGINT)
             END - 1048576 AS td
           FROM x),
         f AS (SELECT doc_id, oov,
             (en * 1048576 + a.v + (a.vn - a.v) * (tn % 1024) // 1024)
             - (ed * 1048576 + b.v + (b.vn - b.v) * (td % 1024) // 1024) AS lg
           FROM t2 LEFT JOIN l2 a ON a.i = tn // 1024
                   LEFT JOIN l2 b ON b.i = td // 1024),
         ag AS (SELECT doc_id, COUNT(*) AS n, SUM(oov) AS n_oov,
             SUM(CASE WHEN oov = 1 THEN 0 ELSE lg END) AS slg
           FROM f GROUP BY 1)
         SELECT doc_id, CAST(n AS BIGINT) AS n_big,
           ROUND(CAST(n_oov AS DOUBLE) / n, 4) AS oov_frac,
           CASE WHEN n > n_oov THEN
             ROUND(CAST(slg AS DOUBLE) / ((n - n_oov) * 1048576.0), 6)
           END AS mean_log2p
         FROM ag""",
    "q211_contamination_join" ->
      s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         gr AS (SELECT doc_id, source,
             CASE WHEN len(toks) < 3 THEN CAST([] AS BIGINT[])
               ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> ${AnalyticsQueries.polyHash61Sql(
        "array_to_string(toks[i:i+2], ' ')")})) END AS gs
           FROM tk),
         bs AS (SELECT DISTINCT unnest(gs) AS g FROM gr WHERE source = 'src0'),
         tot AS (SELECT doc_id, COALESCE(len(gs), 0) AS n_sh
           FROM gr WHERE source <> 'src0'),
         dgx AS (SELECT doc_id, unnest(gs) AS g FROM gr WHERE source <> 'src0'),
         hit AS (SELECT doc_id, COUNT(*) AS n_hit
           FROM dgx JOIN bs USING (g) GROUP BY 1)
         SELECT t.doc_id, CAST(t.n_sh AS BIGINT) AS n_sh,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CASE WHEN t.n_sh = 0 THEN 0.0
             ELSE ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_sh, 6)
           END AS contam_frac
         FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id""",
    "q73_embed_norms" ->
      """WITH n AS (SELECT label,
             CAST(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))
               AS DECIMAL(18,9)) AS nrm
           FROM embeddings)
         SELECT label, COUNT(*) AS n,
           ROUND(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 4) AS avg_norm
         FROM n GROUP BY label""")
}
