package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation: collect the link texts pointing AT each
  * target into a per-target description corpus — the classic web-corpus
  * construction (anchor text describes the target better than the target
  * describes itself; the signal behind anchor-augmented pretraining sets
  * and retrieval training pairs). Rides the S8 regex-extraction family
  * (SURVEY §2: the HTML-table/link source, 多数据源获取数据.py's regex
  * scraping slot) — here the extraction feeds a link-target aggregation
  * instead of a link GRAPH (q145's PageRank consumes the same anchors'
  * hrefs and discards the texts).
  *
  * Scale posture: extraction is a narrow per-row projection; aggregation
  * is a two-level hash agg — (dst, anchor) partials first (map-side
  * combine collapses repeated texts before the exchange), then one
  * dst-keyed pass. The ranking window runs over the (dst, anchor) count
  * frame (already collapsed — bounded by text diversity per target, not
  * by link count) and is partitioned by dst, never global. `all_texts`
  * concatenates DISTINCT texts per target; for open-web diversity cap the
  * per-target text set upstream (e.g. [[Sampling.kPerGroup]] on the count
  * frame) — the aggregate itself never holds more than one target's
  * distinct texts.
  */
object AnchorText {

  /** The attribute prefix is LAZY and must end at a whitespace boundary
    * (`(?:[^>]*?\s)?`), so `href=` binds only a real attribute — a
    * `data-href="/wrong"` earlier in the tag cannot capture (the char
    * before its `href=` is `-`, not whitespace).
    */
  private val TagRe = "<a\\s(?:[^>]*?\\s)?href=\"([^\"]*)\"[^>]*>([^<]*)</a>"

  /** (href, anchor) struct pairs from an HTML column: group-0 tag matches
    * first (extract-all returns a single group portably), then BOTH
    * fields re-extracted by re-matching the SAME full pattern on the tag
    * — a standalone sub-pattern would bind differently on adversarial
    * attribute/URL content (e.g. a `>` inside the href value), while the
    * full pattern resolves groups exactly as the original match did.
    * Anchor text trimmed; plain-text anchors only (`[^<]*`).
    */
  def anchorPairs(htmlCol: Column): Column =
    transform(regexp_extract_all(htmlCol, lit(TagRe), lit(0)),
      t => struct(
        regexp_extract(t, TagRe, 1).as("href"),
        trim(regexp_extract(t, TagRe, 2)).as("anchor")))

  /** Per-target roll-up of an exploded (dst, anchor) frame:
    * (dst, n_links, n_texts, top_anchor, top_cnt, all_texts) where
    * top_anchor is the most frequent text (ties → lexicographically
    * smallest) and all_texts the sorted distinct texts joined with `|`.
    */
  def aggregateAnchors(pairs: DataFrame, dstCol: Column,
      anchorCol: Column): DataFrame = {
    val g1 = pairs.groupBy(dstCol.as("dst"), anchorCol.as("anchor"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("cnt").desc, col("anchor").asc)
    g1.withColumn("__rk", row_number().over(w))
      .groupBy(col("dst"))
      .agg(sum(col("cnt")).as("n_links"),
        count(lit(1)).as("n_texts"),
        max(when(col("__rk") === 1, col("anchor"))).as("top_anchor"),
        max(when(col("__rk") === 1, col("cnt"))).as("top_cnt"),
        array_join(array_sort(collect_list(col("anchor"))), "|").as("all_texts"))
  }
}
