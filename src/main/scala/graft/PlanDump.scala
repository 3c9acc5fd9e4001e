package graft
import java.nio.file.{Files, Paths}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("plans", 8)
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq(
      "q01_pricing_summary" -> "filter pushdown + column pruning + partial/final agg",
      "q02_region_revenue" -> "three broadcast dim joins, zero fact shuffles pre-agg",
      "q03_top_orders_per_cust" -> "WindowGroupLimit partial/final (top-k crosses exchange as k rows/group)",
      "q42_cosine_topk" -> "broadcast query batch; shuffle-free candidate scan",
      "q45_minhash_lsh" -> "id+band+bucket candidate join; shingle strings never shuffled",
      "q47_ivf_topk" -> "seeded codebook rides as expression state; bucketed equi-join, broadcast query side",
      "q54_pad_rows" -> "global max via two-level agg + 1-row broadcast (no single-partition window)",
      "q60_search_fanout" -> "dense-key round-robin: pure projection over the fan-out, zero windows",
      "q80_subtitle_times" -> "abs/rel resolution: one keyed window pass, integer arithmetic",
      "q86_neardup_removal" -> "LSH pairs persisted once; size-gated local union-find labels (checkpointed) -> broadcast ANTI-join of non-min members (corpus side never reshuffles)",
      "q88_rerank_lexical" -> "inverted-index rerank: broadcast query-term semi-join BEFORE any agg (shuffles carry query-term postings only), len rides the explode, df/N broadcast",
      "q48_task_distribution" -> "broadcast fan-out join with OR condition",
      "q62_asof_last_event" -> "as-of join as union+window: one shuffle, no range explosion",
      "q66_hash_split" -> "deterministic split: pure map-side projection, zero exchanges",
      "q69_repetition" -> "per-row repetition folds: narrow projection, no explode/shuffle",
      "q70_contamination" -> "benchmark set broadcast; only doc-id hit-count shuffles",
      "q72_embed_quantize" -> "compiled one-pass quantize summary: scan -> project, no shuffle",
      "q75_asof_merge_exec" -> "whole-operator as-of: co-clustered exchanges + sorts + streaming merge",
      "q76_chunk_docs" -> "chunker: Generate over a narrow projection, zero exchanges",
      "q41_jaccard_pairs" -> "exact-Jaccard verify DOWNSTREAM of 16x2 LSH banding: candidate join bounded by band-bucket size",
      "q81_csv_roundtrip" -> "large-cap CSV: distributed limit, caller schema (no inferSchema scan), no driver LocalTableScan",
      "q93_image_dims" -> "image-header decode: mapPartitions encode + compiled ImageDims projection, no shuffle",
      "q94_ivf_trained" -> "fixed-point-trained codebook as expression state; bucketed equi-join, broadcast query side",
      "q95_region_parse" -> "full region dimension as literal arrays + HOF filters: narrow projection, zero joins; each scan stage aliased once (no re-evaluation)",
      "q100_lm_quality" -> "LM scoring: compiled trigram-hash kernel in both scans; model join + aggs shuffle longs only, never trigram strings",
      "q102_lm_perplexity" -> "perplexity ranking: fixed-point log2 computed once per MODEL row (vocab-bounded); doc side joins + sums longs",
      "q101_mp3_meta" -> "MP3 metadata: mapPartitions encode + frame walk, zero shuffles",
      "q103_provider_normalize" -> "provider normalization: from_json + per-provider projections over the fixture scan, no shuffle until the label dim broadcast",
      "q104_aac_meta" -> "AAC ADTS metadata: mapPartitions encode + per-frame VBR walk, zero shuffles",
      "q105_video_frames" -> "AVI frame decode: mapPartitions encode + container/pixel walk with frame sampling, zero shuffles",
      "q106_substring_spans" -> "exact-substring spans: compiled gram hashes in the scan, (id,pos,h) exchanges only, gram index shuffled once (reuse), sparse per-doc window merge",
      "q109_compressed_text" -> "compressed ingestion: mapPartitions compress/sniff/inflate round trip, zero shuffles",
      "q112_warc_ingest" -> "WARC ingestion: mapPartitions record walk (gzip members inflated in-task), zero shuffles after the fixture build",
      "q114_semdedup" -> "SemDeDup: compiled argmax assignment in the scan (codebook as digest-referenced expression state, not inlined literals); cluster equi-join bounds the pair quadratic; left-anti survivors",
      "q153_pdf_layout" -> "PDF layout decode: mapPartitions positioned-operator eval + y-sort assembly, zero shuffles after the fixture build",
      "q154_html_main" -> "HTML main-content: block scoring as one narrow codegen regex/HOF projection, zero exchanges",
      "q155_excel_dates" -> "Excel typed dates: executor-side workbook parse (binaryFile scan), union of two format scans, no driver LocalTableScan",
      "q115_tar_members" -> "TAR members: mapPartitions ustar walk with checksum verify, zero shuffles after the fixture build",
      "q116_zip_members" -> "ZIP members: EOCD/CD walk + raw inflate + CRC in one task per archive, zero shuffles after the fixture build",
      "q113_gopher_rules" -> "Gopher rules: one narrow codegen projection, no explode, zero exchanges",
      "q117_temperature_mix" -> "temperature mix: corpus hash-agg; normalizer as 1-row broadcast (q54 pattern, no single-partition window)",
      "q118_domain_quota" -> "domain quota: registrable-domain projection + WindowGroupLimit per-domain cap (k rows/group cross the exchange)",
      "q120_robots_gate" -> "robots gate: domain-bounded rules broadcast into the URL scan; one keyed window ranks matches, no URL-side shuffle",
      "q121_boilerplate_lines" -> "boilerplate lines: 8-byte line hashes shuffle (never line text x corpus); flagged head-of-distribution set broadcast anti-join; one reassembly exchange",
      "q122_line_dedup_doc" -> "within-doc line dedup: compiled PolyFirstOccurrence projection, zero exchanges (per-row semantics never shuffle)",
      "q125_bm25" -> "BM25: 1-row corpus stats + query-term idf broadcasts (log2fp on the term side only); one (doc,term) tf agg; WindowGroupLimit top-k",
      "q133_xls_roundtrip" -> "BIFF8 scan: binaryFile -> executor-side CFB+record walk (one bounded header collect for the schema), no shuffle",
      "q134_curation_pipeline" -> "end-to-end curation: every stage boundary a narrow filter or broadcast join (robots rules broadcast, Gopher keepFlag inline, lang rides the line-removal carry); only stage-owned exchanges remain (fixture groupBy, quota window, line-freq agg + regroup, LSH band join, final mixture agg)",
      "q135_substring_spans64" -> "61-bit substring spans: same single-shuffled gram-index shape as q106, hashes poly131 mod 2^61-1 instead of poly31",
      "q136_quality_classifier" -> "hashed linear classifier: ONE narrow codegen projection (integer weight fold per row), no explode, no shuffle",
      "q137_training_shards" -> "shard export assignments: narrow hash projection + one per-shard row_number sort - the global-shuffle floor",
      "q141_blocklist" -> "Aho-Corasick blocklist: ONE compiled automaton projection (RefKernelCodegen), no explode, zero exchanges at any dictionary size",
      "q142_c4_clean" -> "C4 cleaning: array-lambda line rules + page kills as one narrow projection, zero exchanges",
      "q144_zorder_key" -> "Z-order keys: shift/mask ladder as a pure codegen projection over the scan, zero exchanges",
      "q145_page_authority" -> "PageRank: href re-extraction narrow; per-round edges-ranks equi-join + dst-keyed agg, ranks checkpointed (constant-size plan); outdeg joined ONCE upfront",
      "q147_phrase_search" -> "phrase search: postings semi-restricted to phrase vocabulary by broadcast BEFORE the corpus exchange; start-voting agg keyed (phrase,doc,start); phrase lengths broadcast",
      "q148_audio_fingerprint" -> "audio fingerprint: mapPartitions WAV encode + PCM energy-contour fold, zero shuffles until the fp group count",
      "q149_heavy_hitters" -> "heavy hitters: per-partition Misra-Gries candidates (mapPartitions) -> broadcast semi-join -> exact recount; the long tail never crosses an exchange",
      "q150_pq_topk" -> "PQ ANN: compiled encode behind a checkpoint barrier (codes scanned, not floats); broadcast pre-quantized queries; primitive ADC loop; WindowGroupLimit top-k",
      "q151_ivfpq_topk" -> "IVF+PQ: one index pass (bucket + codes, checkpointed); bucket equi-join bounds the pair stream; ADC within probed buckets only",
      "q161_dsir_selection" -> "DSIR: ONE compiled scoring pass (digest-rendered delta table), checkpointed slim frame; quota = per-partition mapPartitions take(quota) prune -> bounded global rank -> 1-row broadcast cutoff flag join (no full-pool sort at ANY quota)",
      "q172_funnel" -> "funnel: ONE user-keyed exchange (sorted fold inside the agg); stage events pre-filtered before the shuffle; report joins its own stage-1 count via 1-row broadcast",
      "q178_triangle_count" -> "triangles: degree-ordered orientation (O(sqrt m) out-degree) -> wedge equi-join on the low corner + single-direction closure LeftSemi; all exchanges keyed on vertex ids",
      "q180_sentence_chunks" -> "sentence chunking: split + token counts + greedy fold all inside transform/aggregate HOFs -> Generate fan-out; ZERO exchanges",
      "q182_content_digest" -> "content digest: md5-prefix row hash in the scan projection -> partial/final 1-row agg; nothing but 128-bit partial sums cross the exchange",
      "q183_interval_overlap" -> "interval overlap: both sides binned (Generate), ONE (key,bin) equi-join; bin-of-overlap-start emits each pair once (no distinct pass)",
      "q187_quantile_bins" -> "quantile bins: two-stage distributed prefix sum — within-coarse-bucket PARTITIONED window + broadcast triangular bucket-prefix join; NO single-partition window anywhere",
      "q190_ewma" -> "fixed-point EWMA: one user-keyed exchange, recursion folds inside the agg (no per-step shuffles)",
      "q193_copurchase" -> "co-purchase: within-basket pair self-join on the order key (fan-out bounded by basket size), pair agg, WindowGroupLimit top-3 per item",
      "q196_geo_pairs" -> "geo radius pairs: 3x3 neighbor-cell Generate on the left, ONE (latc,lngc) equi-join, integer distance filter — each qualifying pair meets exactly once",
      "q201_schema_validate" -> "schema-as-contract: the whole draft-07 contract compiled to ONE narrow Project over variant expressions — zero exchanges, zero joins; validation cost is per-row columnar work at any corpus size",
      "q203_repetition_rules" -> "Gopher repetition rules: per-row sort + run-length folds (dup lines, top/dup n-gram char fractions) in ONE narrow Project — no shuffle, scan speed at any scale",
      "q205_cdc_chunks" -> "content-defined chunking: two compiled O(n) Gear-CDC kernel calls + array intersect per row, ONE narrow Project — the storage-dedup primitive runs at scan speed",
      "q208_kn_lm" -> "Kneser-Ney scoring: ONE corpus pass builds the checkpointed packed-bigram table (model frames vocab-bounded); doc side = one explode + three 8-byte-key joins + one-row broadcast total, fixed-point log2 in the projection",
      "q211_contamination_join" -> "join-form decontamination: bench grams distributed (no driver broadcast), Bloom probe INSIDE the per-row array before explode (non-matching grams never reach the exchange), n_sh from a same-projection size()",
      "q216_section_chunks" -> "section chunking: lambda-bound render evaluated ONCE -> Generate -> a single doc-keyed sort shared by all four window functions -> section agg; the one exchange vanishes on doc-clustered input (SCALE.md receipt)",
      "q219_source_kl" -> "per-source KL: corpus pass collapses to (source x vocab) counts BEFORE anything wide moves; global-log table joins back on the 8-byte hash, totals ride broadcasts; 6.6 MB total shuffle at 10M docs",
      "q220_retrieval_eval" -> "retrieval eval: |q|x10 ranked rows BROADCAST into the corpus-sized gold join (gold never shuffles on the pair key); ideal-DCG is a per-row fold; per-query aggs |q|-bounded",
      "q222_l_diversity" -> "l-diversity: (quasi, sensitive) counts exchange once, quasi rollup over collapsed counts; no windows, no collects, log2fp per (class,value) only",
      "q232_vocab_overlap" -> "vocab overlap matrix: ONE row-level exchange builds the distinct (source,token) incidence (checkpointed for its 3 consumers); pairs self-join ON THE TOKEN (C(k,2) fan-out per token, k<=|sources|), sizes ride broadcasts — never an all-pairs document comparison",
      "q233_hits" -> "HITS: participants-only score frames — each half-step is edges-join-scores + keyed sum + 1-row max broadcast; full node list joined ONCE at the end; per-round localCheckpoint keeps the plan constant-size, a checkpointed before h consumes it (no double gather)",
      "q234_concentration" -> "Gini/top-decile: one sort-within-group window (row_number only, growing frame) + one rollup + rank-boundary join — a single exchange on the group key; per-term i*x widened to decimal(38,0) pre-sum",
      "q235_bootstrap_ci" -> "Poisson bootstrap: the B-fold explode collapses MAP-SIDE (partial agg keys on (group, resample)) — the one exchange carries |groups|*B rows regardless of input size; final per-group collect is B-bounded; no windows",
      "q236_rfm" -> "RFM: one customer-grain aggregation (the only row-level exchange) + three distinct-value-bounded quantile mappings (two-stage prefix sums — the guard-banned global NTILE never appears) joined back on the metric value",
      "q237_pmi" -> "mutual information: ONE row-level exchange builds the checkpointed joint-count table; marginals/total/MI rollup all |X|*|Y|-bounded, riding broadcasts; log2fp once per cell, never per row",
      "q238_corr_matrix" -> "one-pass Pearson matrix: two narrow aggregations (means, then m(m+3)/2 centered sums) + two one-row broadcasts; the m^2 pair expansion happens on the SINGLE aggregate row — 0.0 MB shuffle at 10M rows",
      "q239_kmv_registers" -> "KMV bottom-k sketch: (group,hash)-distinct exchange collapses map-side, then WindowGroupLimit — only k rows per group cross the final exchange; no collects",
      "q240_kmv_estimate" -> "KMV merge law: per-language sketches union + re-min-k (k-bounded everywhere) + integer estimator — the per-shard-sketch shape that replaces raw-value re-shuffles at 100 TB",
      "q241_textrank" -> "TextRank = weighted pageRank over collapsed co-occurrence edges: ONE doc-keyed sort feeds both lead() columns; the multiset collapses to vocab^2-bounded (src,dst,w) BEFORE iteration (bit-identical to the multigraph, spec-pinned); final top-k is TakeOrdered",
      "q242_kmv_agg" -> "KMV via BottomKAgg UDAF: the exchange carries one <=k buffer per (partition, group) — input-size-independent (10M receipt: 394.5 -> 4.0 MB, 97.5x); same registers as the window build, and it streams",
      "q243_theil_sen" -> "Theil-Sen: pair fan-out is per-SERIES O(m^2) and group-local (0.5 MB shuffle at 10M pairs); median picked by a group-keyed window, never a global sort of slopes",
      "q244_top_other" -> "top-N+other: ONE key aggregation, top-n off the bounded frame as TakeOrdered, ranks by broadcast n x n self-join, tail pooled by broadcast anti-join — the guard-banned global rank window never appears",
      "q245_dispersion" -> "dispersion index: (group, bucket) counts collapse map-side, group rollup computes the Fano factor with empty buckets counted arithmetically (span/step) — never materialized")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (sf0.01, captured by tools; regenerate via graft.PlanDump)\n")
    interesting.foreach { case (q, why) =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()  // let AQE finalize
      sb.append(s"\n## $q — $why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.take(3000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("WROTE PLANS.md")
    spark.stop()
  }
}
