package graft.operators

import graft.functions.{Log2Fixed, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson/Spärck Jones) over a document corpus,
  * in BIT-PORTABLE fixed-point arithmetic so rankings are oracle-checkable
  * (q125) — the corpus-side complement of the per-pair lexical reranker
  * (X8, q88): that one scores a given (query, doc) list, this one RETRIEVES
  * from the whole corpus with corpus statistics (df, avgdl).
  *
  * Scoring. With k1 = 6/5 and b = 3/4 (the textbook defaults as exact
  * rationals), S = Σ dl (total corpus tokens) and N = #docs, the per-term
  * BM25 contribution clears to integers:
  *
  *   tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
  *     = 44·tf·S / (20·tf·S + 6·S + 18·dl·N)        (avgdl = S/N)
  *
  *   idf_fp(t) = log2fp(N) − log2fp(df_t)           (log2(N/df), ≥ 0,
  *                                                   2^20 fixed point —
  *                                                   the q102 kernel)
  *
  *   score_fp(D,Q) = Σ_t (idf_fp(t) · 44·tf·S) div (20·tf·S + 6·S + 18·dl·N)
  *
  * MULTIPLY-THEN-DIVIDE: the single floor division happens after the
  * product with idf_fp, so the quotient keeps ~20 fractional bits — the
  * floor costs < 2^-20 of a score unit, and both engines floor identically.
  *
  * Overflow bound: idf_fp < 64·2^20 < 2^26 and 44·tf·S must stay below
  * 2^63−26 ⇒ tf·S < 2^31.5. Fine to ~10^9 total tokens at default use;
  * beyond that scale, run per-shard (per-language/per-source corpora) or
  * move the product to decimal(38,0) — the floor-division algebra is
  * unchanged.
  *
  * Scale posture: corpus stats (N, S) are a 1-row broadcast; query terms
  * and their df are term-count-bounded broadcasts; the only corpus-wide
  * work is one (doc, term) tf aggregation (map-side combine over the
  * per-doc token explode) and the score groupBy keyed (query, doc). Top-k
  * per query compiles to WindowGroupLimit via [[Ranking.topKPerGroup]], so
  * only k rows per query cross the final exchange.
  */
object Bm25 {

  /** Top-k BM25 retrieval.
    *
    * @param docs    corpus, one row per document.
    * @param idCol   unique doc id; textCol the document text.
    * @param queries one row per query: qidCol unique id, qtextCol text.
    * @param k       results per query.
    * Returns (query_id, doc_id, rnk, score_fp) — score in 2^20 fixed point;
    * only docs sharing >= 1 term with the query appear (BM25's support).
    */
  def topK(
      docs: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, qidCol: Column, qtextCol: Column,
      k: Int): DataFrame =
    topKFromTerms(docs, idCol, textCol,
      queryTerms(queries, qidCol, qtextCol), k)

  /** Tokenize queries into the (query_id, term) frame [[topKFromTerms]]
    * scores — exposed so expansion stages (q152) can append terms.
    */
  def queryTerms(queries: DataFrame, qidCol: Column, qtextCol: Column): DataFrame =
    queries
      .select(qidCol.as("query_id"), explode(TextFunctions.tokens(qtextCol)).as("term"))
      .distinct()

  /** (doc_id, __toks) with the tokenize done exactly ONCE per row: the
    * `explode(array(tokens))` Generate pins `__toks` to an ATTRIBUTE, so
    * the `size(__toks) > 0` filter InferFiltersFromGenerate later infers
    * for the postings explode evaluates the attribute instead of
    * re-tokenizing (the un-barriered form paid tokenize ×3 per row:
    * projection + two inferred-filter copies pushed below it). spread()
    * below the tokenize repairs under-split inputs (single-row-group
    * fixture = ONE scan task).
    */
  private def tokArrays(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    graft.core.Parallelism.spread(
        docs.select(idCol.as("doc_id"), textCol.as("__text")))
      .select(col("doc_id"),
        explode(array(TextFunctions.tokens(col("__text")))).as("__toks"))

  /** 1-row corpus stats (n_corpus = #docs, s_corpus = Σ dl) — exposed so
    * multi-pass callers ([[topKExpanded]]) compute the corpus-wide pass
    * once and hand it to every [[topKFromTerms]] invocation.
    */
  def corpusStats(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    tokArrays(docs, idCol, textCol)
      .agg(count(lit(1)).as("n_corpus"),
        sum(size(col("__toks"))).cast("long").as("s_corpus"))

  /** [[topK]] over an explicit (query_id, term) frame.
    *
    * @param stats optional precomputed [[corpusStats]] frame (1 row);
    *   when absent it is computed here — its own corpus pass.
    */
  def topKFromTerms(
      docs: DataFrame, idCol: Column, textCol: Column,
      qterms: DataFrame, k: Int, stats: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val scored = scoredCore(docs, idCol, textCol, qterms, stats,
      withMatches = false)
    Ranking.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("score_fp").desc, col("doc_id").asc), k, rankCol = Some("rnk"))
      .select(col("query_id"), col("doc_id"), col("rnk"), col("score_fp"))
  }

  /** The FULL scored frame (query_id, doc_id, score_fp, n_matched) —
    * every doc sharing >= 1 term with the query, scored exactly as
    * [[topKFromTerms]], plus the count of DISTINCT query terms the doc
    * contains. One corpus pass serves both the top-k ranking AND any
    * all-terms-matched ("gold") derivation: n_matched equals the number
    * of (term ∈ query) ∩ (term ∈ doc) pairs, so a caller needing "docs
    * containing ALL query terms" filters n_matched == |query terms|
    * instead of re-tokenizing the corpus a second time (q220 paid a
    * second full tokenize + three joins for exactly that set).
    * Callers consuming the frame more than once should materialize it
    * (bounded by queries × their term-matching docs — one row per
    * (query, matching doc), the same frame topK ranks).
    */
  def scoredWithMatches(
      docs: DataFrame, idCol: Column, textCol: Column,
      qterms: DataFrame, stats: Option[DataFrame] = None): DataFrame =
    scoredCore(docs, idCol, textCol, qterms, stats, withMatches = true)

  private def scoredCore(
      docs: DataFrame, idCol: Column, textCol: Column,
      qterms: DataFrame, stats: Option[DataFrame],
      withMatches: Boolean): DataFrame = {
    val toks = tokArrays(docs, idCol, textCol)
    val termSet = qterms.select(col("term")).distinct()
    // The broadcast query-term semi-restrict runs BEFORE the tf
    // aggregation (the q88 lesson applied corpus-side): tf(t,d) and
    // df(t) restricted to query terms equal their corpus-wide values, so
    // the ONE corpus-wide exchange carries query-term postings only —
    // never the full (doc, term) inverted index.
    val d = toks.select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
    val tf = d.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // 1-row corpus stats, cross-broadcast onto every scored row.
    val st = stats.getOrElse(corpusStats(docs, idCol, textCol))
    // df as a term-keyed WINDOW over the tf frame (r13): the groupBy +
    // broadcast-join form consumed tf TWICE, re-executing the whole
    // corpus scan + tokenize + explode + agg subtree per consumer; the
    // window keeps tf single-consumer with no materialization barrier.
    // log2fp(df) now runs per POSTING row instead of per term — it is
    // the compiled Log2FixedExpr kernel (r13), ~an integer fold, so the
    // q102 "keep logs vocabulary-bounded" costing no longer binds. The
    // postings frame is query-vocabulary-restricted throughout, never
    // corpus-sized.
    val contrib = tf
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(st))
      .withColumn("__idf",
        Log2Fixed.expr(col("n_corpus")) - Log2Fixed.expr(col("__df")))
      .withColumn("__contrib", expr(
        "__idf * (44L * tf * s_corpus) div " +
          "(20L * tf * s_corpus + 6L * s_corpus + 18L * dl * n_corpus)"))
      .groupBy(col("query_id"), col("doc_id"))
    if (withMatches)
      // tf is distinct on (doc, term), so the group's row count IS the
      // number of distinct query terms the doc contains
      contrib.agg(sum(col("__contrib")).as("score_fp"),
        count(lit(1)).as("n_matched"))
    else
      contrib.agg(sum(col("__contrib")).as("score_fp"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty 2001)
    * — the language-modeling ranker next to [[topK]]'s BM25: documents
    * rank by log p(q|d) under p(t|d) = (tf + μ·cf_t/S) / (dl + μ). In
    * the standard rank-equivalent decomposition, with every log the
    * integer [[Log2Fixed]] kernel (so the whole ranking is
    * oracle-replayable, q270):
    *
    *   score_fp(D,Q) = Σ_{t ∈ q∩d} [log2fp(μ·cf_t + tf·S) − log2fp(μ·cf_t)]
    *                 + n_q · [log2fp(μ) − log2fp(dl + μ)]
    *
    * where S = total corpus tokens, cf_t = collection frequency, and
    * n_q = the query's DISTINCT terms present in the corpus vocabulary
    * (true QLM gives out-of-vocabulary terms probability 0 — every
    * score −∞; dropping them is the standard convention). The dropped
    * Σ_t log(μ·cf_t / S) is constant per query, so rankings are the
    * textbook ones. Scores are negative-capable fixed-point logs —
    * comparable within a query, not across queries.
    *
    * Unlike BM25's algebra the matched-term log argument depends on
    * (tf, cf), so ONE log2fp runs per posting row — an O(1) compiled
    * integer kernel, not a join. Envelope: μ·cf + tf·S must fit a long
    * — at μ = 2000 that binds around S ≈ 10⁹ total tokens with tf ≤
    * 10⁴ (the BM25 bound class); per-shard corpora beyond.
    *
    * Scale posture: [[topK]]'s exactly — term-set broadcast BEFORE the
    * tf aggregation, 1-row stats broadcast, cf and n_q as term-/query-
    * keyed windows on the single postings chain (no re-executed corpus
    * subtrees), score groupBy keyed (query, doc), WindowGroupLimit
    * top-k.
    *
    * @return (query_id, doc_id, rnk, score_fp); only docs sharing ≥ 1
    *   term with the query appear (the BM25 support convention).
    */
  def dirichletTopK(
      docs: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, qidCol: Column, qtextCol: Column,
      k: Int, mu: Long = 2000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(mu >= 1L, s"mu must be >= 1, got $mu")
    val qterms = queryTerms(queries, qidCol, qtextCol)
    val toks = tokArrays(docs, idCol, textCol)
    val termSet = qterms.select(col("term")).distinct()
    // S is a CORPUS stat — computed before the query-term restriction
    val stats = toks.agg(sum(size(col("__toks"))).cast("long").as("s_corpus"))
    val d = toks.select(col("doc_id"),
        size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
    val tf = d.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // cf as a term-keyed WINDOW (the topKFromTerms r13 shape): the
    // cfs-frame form consumed tf twice, re-running the corpus subtree per
    // consumer; log2fp is the compiled kernel now, fine per posting row.
    // n_q (distinct query terms present in the corpus vocabulary) rides
    // two more windows on the SAME single-consumer chain: first-occurrence
    // flag per (query, term), summed over the query partition — the
    // separate semi-join frame would re-run the corpus subtree again.
    import org.apache.spark.sql.expressions.Window
    val matched = tf
      .withColumn("cf", sum(col("tf")).over(Window.partitionBy(col("term"))))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__c",
        Log2Fixed.expr(lit(mu) * col("cf") + col("tf") * col("s_corpus")) -
          Log2Fixed.expr(lit(mu) * col("cf")))
      .withColumn("__first", when(row_number().over(
        Window.partitionBy(col("query_id"), col("term"))
          .orderBy(col("doc_id"))) === 1, 1L).otherwise(0L))
      .withColumn("__nq", sum(col("__first")).over(
        Window.partitionBy(col("query_id"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("__m"), first(col("dl")).as("dl"),
        first(col("__nq")).as("__nq"))
    val scored = matched
      .select(col("query_id"), col("doc_id"),
        (col("__m") + col("__nq") *
          (Log2Fixed.expr(lit(mu)) - Log2Fixed.expr(col("dl") + mu)))
          .as("score_fp"))
    Ranking.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("score_fp").desc, col("doc_id").asc), k, rankCol = Some("rnk"))
      .select(col("query_id"), col("doc_id"), col("rnk"), col("score_fp"))
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 family's
    * deterministic core): first-pass BM25 retrieves `feedbackN` docs per
    * query; the `expandTerms` most frequent terms WITHIN that feedback
    * set (original query terms excluded; ties to lexicographically first)
    * join the query; the expanded term set rescores the corpus. Every
    * stage is the same fixed-point arithmetic as [[topK]], so the whole
    * two-pass chain is oracle-replayable (q152) — the classic RM3 would
    * interpolate float term weights, which no cross-engine hash survives.
    *
    * Scale posture: both passes keep topK's shape (term-set broadcasts,
    * one (doc, term) tf agg each); the feedback join touches
    * |queries|·feedbackN doc ids, broadcast back onto the token explode.
    */
  def topKExpanded(
      docs: DataFrame, idCol: Column, textCol: Column,
      queries: DataFrame, qidCol: Column, qtextCol: Column,
      k: Int, feedbackN: Int = 3, expandTerms: Int = 3): DataFrame = {
    require(feedbackN >= 1 && expandTerms >= 0,
      "feedbackN must be >= 1 and expandTerms >= 0")
    val qterms = queryTerms(queries, qidCol, qtextCol)
    // ONE corpus-stats pass shared by both retrieval passes (N and S are
    // corpus constants — the second pass recomputing them paid a full
    // tokenize); 1-row frame, eagerly pinned
    val stats = Some(corpusStats(docs, idCol, textCol).localCheckpoint())
    // eager checkpoint: the feedback frame (|queries|·feedbackN rows) is
    // consumed twice (doc semi-restrict + per-query frequency join) — an
    // unmaterialized plan would run the whole first-pass BM25 twice
    val feedback = topKFromTerms(docs, idCol, textCol, qterms, feedbackN, stats)
      .select(col("query_id"), col("doc_id"))
      .localCheckpoint()
    // semi-restrict to the |queries|·feedbackN feedback docs BEFORE
    // tokenizing — exploding the whole corpus to count terms in a handful
    // of docs paid a full tokenize pass (measured ~1/3 of q152)
    val fbDocs = docs
      .join(broadcast(feedback.select(col("doc_id").as("__fb_id")).distinct()),
        idCol === col("__fb_id"), "left_semi")
    val toks = fbDocs.select(idCol.as("doc_id"),
      explode(TextFunctions.tokens(textCol)).as("term"))
    val fbFreq = toks
      .join(broadcast(feedback), Seq("doc_id"))
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("__ff"))
      .join(qterms, Seq("query_id", "term"), "left_anti")
    val expansion = Ranking.topKPerGroup(fbFreq, Seq(col("query_id")),
        Seq(col("__ff").desc, col("term").asc), expandTerms, rankCol = None)
      .select(col("query_id"), col("term"))
    // same double-execution trap as the feedback frame: topKFromTerms
    // references its term frame twice (vocabulary semi-restrict + scoring
    // join), and an unmaterialized expansion plan would re-run the entire
    // first pass + feedback aggregation for each reference (r14 re-tested
    // dropping this checkpoint with feedback materialized: 3.79 s -> 3.95
    // s, no win — the double broadcast build costs what the job saves)
    val expandedTerms = qterms.unionByName(expansion).localCheckpoint()
    topKFromTerms(docs, idCol, textCol, expandedTerms, k, stats)
  }

  /** Exact phrase retrieval over a POSITIONAL inverted index — the "quoted
    * query" complement to [[topK]]'s bag-of-words scoring.
    *
    * The classic one-join adjacency trick: a phrase t₀…t_{k−1} occurs at
    * start p iff term tᵢ has a posting at p+i for every offset i, so every
    * (posting ⋈ phrase-term) pair votes for start = pos − offset, and a
    * start with exactly k distinct offset votes is a full occurrence (for
    * a fixed start each offset can vote at most once — pos is pinned to
    * start+offset — so the count is exact even when the phrase repeats a
    * term, e.g. "batch batch").
    *
    * Scale posture: postings are semi-restricted to the phrase vocabulary
    * by broadcast BEFORE leaving the scan, so the one corpus-wide exchange
    * carries phrase-term postings only, keyed (phrase, doc, start); phrase
    * terms and lengths ride as broadcasts. No index materialization step —
    * at 100 TB, persist the restricted postings frame bucketed by term to
    * amortize across query batches.
    *
    * @return (phrase_id, doc_id, n_matches, first_pos) — matched docs only.
    */
  def phraseSearch(
      docs: DataFrame, idCol: Column, textCol: Column,
      phrases: DataFrame, pidCol: Column, ptextCol: Column): DataFrame = {
    val pterms = phrases.select(pidCol.as("phrase_id"),
      posexplode(TextFunctions.tokens(ptextCol)).as(Seq("off", "term")))
    val plen = pterms.groupBy(col("phrase_id")).agg(count(lit(1)).as("__k"))
    val termSet = pterms.select(col("term")).distinct()
    val postings = docs
      .select(idCol.as("doc_id"),
        posexplode(TextFunctions.tokens(textCol)).as(Seq("pos", "term")))
      .join(broadcast(termSet), Seq("term"), "left_semi")
    val starts = postings.join(broadcast(pterms), Seq("term"))
      .select(col("phrase_id"), col("doc_id"), (col("pos") - col("off")).as("start"))
      .filter(col("start") >= 0)
    starts
      .groupBy(col("phrase_id"), col("doc_id"), col("start"))
      .agg(count(lit(1)).as("__hit"))
      .join(broadcast(plen), Seq("phrase_id"))
      .filter(col("__hit") === col("__k"))
      .groupBy(col("phrase_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
  }
}
