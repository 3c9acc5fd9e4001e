package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S9–S12 — the four search-provider connectors' NORMALIZATION layer as
  * tested Column projections (多数据源获取链接.py:776-980). The reference
  * wraps each provider in prefix-keyed dicts (`searchapi_url`, `jina_title`
  * …); per SURVEY §1.1 the dynamic-prefix trick normalizes away into ONE
  * fixed schema + a `provider` discriminator column. What stays per
  * provider is the response-body field map:
  *
  *   searchapi  organic_results[]  link→url  title  source(∅→"")  snippet
  *   jina       data[][:n]         url       title  description→snippet  content(∅→"")
  *   firecrawl  data.web[]         url       title  description→snippet  markdown(∅→"")
  *   tavily     results[]          url       title  content→snippet      score
  *
  * plus two shared contracts:
  *  - items with a missing url/link are SKIPPED (reference `continue`);
  *    only jina slices client-side to `numResults` (the others pass the
  *    cap to the API);
  *  - a failed request/parse emits ONE in-band ERROR ROW carrying only
  *    (provider, search_type, error="<Label> request failed for '<q>': …")
  *    with every data field null (LINKS:873-875 — errors flow through the
  *    relational pipeline instead of failing the job).
  *
  * Input: one row per (query, search_type, raw) response — raw is the
  * recorded/fetched body string; the HTTP socket itself is the seam
  * (PageFetcher pattern). Everything here is `from_json` + explode +
  * projections: codegen'd, no UDFs, no shuffles.
  */
object Providers {

  /** `_parse_video_url` (LINKS:646-663): douyin numeric ids keep the raw
    * url as embed; bilibili BV ids embed through the player URL; everything
    * else passes through with a null id. The thumbnail is a constant
    * placeholder in the reference (its CDN asset) — parameterized here.
    */
  val DefaultVideoThumbnail = "about:invalid#video-thumbnail"

  def parseVideoUrl(url: Column, thumbnail: String = DefaultVideoThumbnail): Column = {
    val douyin = regexp_extract(url, "/video/(\\d+)", 1)
    val bili = regexp_extract(url, "bilibili\\.com/video/(BV[a-zA-Z0-9]+)", 1)
    struct(
      when(douyin =!= "", douyin).when(bili =!= "", bili)
        .otherwise(lit(null).cast(StringType)).as("video_id"),
      when(douyin =!= "", url)
        .when(bili =!= "", concat(lit("//player.bilibili.com/player.html?bvid="), bili))
        .otherwise(url).as("embed_url"),
      lit(thumbnail).as("thumbnail_url"))
  }

  /** One normalized schema for all providers (SURVEY §1.1 search-result
    * record): data fields a provider doesn't supply stay null.
    */
  val resultSchema: StructType = StructType(Seq(
    StructField("provider", StringType, nullable = false),
    StructField("query", StringType, nullable = true),
    StructField("search_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("snippet", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("markdown", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("video_id", StringType, nullable = true),
    StructField("embed_url", StringType, nullable = true),
    StructField("thumbnail_url", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  private case class Spec(
      name: String,
      label: String,
      schema: StructType,
      items: Column => Column,
      url: Column => Column,
      title: Column => Column,
      snippet: Column => Column,
      source: Column => Column,
      content: Column => Column,
      markdown: Column => Column,
      score: Column => Column,
      clientSlice: Boolean)

  private val nullStr: Column => Column = _ => lit(null).cast(StringType)
  private val nullDbl: Column => Column = _ => lit(null).cast(DoubleType)

  private def arr(fields: (String, DataType)*): DataType =
    ArrayType(StructType(fields.map { case (n, t) => StructField(n, t) }))

  private val specs: Map[String, Spec] = Map(
    "searchapi" -> Spec("searchapi", "SearchAPI.io",
      StructType(Seq(StructField("organic_results", arr(
        "link" -> StringType, "title" -> StringType,
        "source" -> StringType, "snippet" -> StringType)))),
      _.getField("organic_results"),
      url = _.getField("link"),
      title = _.getField("title"),
      snippet = _.getField("snippet"),
      source = i => coalesce(i.getField("source"), lit("")),
      content = nullStr, markdown = nullStr, score = nullDbl,
      clientSlice = false),
    "jina" -> Spec("jina", "Jina.ai",
      StructType(Seq(StructField("data", arr(
        "url" -> StringType, "title" -> StringType,
        "description" -> StringType, "content" -> StringType)))),
      _.getField("data"),
      url = _.getField("url"),
      title = _.getField("title"),
      snippet = _.getField("description"),
      source = nullStr,
      content = i => coalesce(i.getField("content"), lit("")),
      markdown = nullStr, score = nullDbl,
      clientSlice = true),
    "firecrawl" -> Spec("firecrawl", "Firecrawl",
      StructType(Seq(StructField("data", StructType(Seq(StructField("web", arr(
        "url" -> StringType, "title" -> StringType,
        "description" -> StringType, "markdown" -> StringType))))))),
      _.getField("data").getField("web"),
      url = _.getField("url"),
      title = _.getField("title"),
      snippet = _.getField("description"),
      source = nullStr, content = nullStr,
      markdown = i => coalesce(i.getField("markdown"), lit("")),
      score = nullDbl,
      clientSlice = false),
    "tavily" -> Spec("tavily", "Tavily",
      StructType(Seq(StructField("results", arr(
        "url" -> StringType, "title" -> StringType,
        "content" -> StringType, "score" -> DoubleType)))),
      _.getField("results"),
      url = _.getField("url"),
      title = _.getField("title"),
      snippet = _.getField("content"),
      source = nullStr, content = nullStr, markdown = nullStr,
      score = _.getField("score"),
      clientSlice = false))

  val providerNames: Seq[String] = Seq("searchapi", "jina", "firecrawl", "tavily")

  /** Normalize recorded/fetched responses for one provider. `responses`
    * carries (query, search_type, raw); output follows [[resultSchema]].
    * A raw body that does not parse to the provider's results path yields
    * the reference's single in-band error row for that query.
    */
  def normalize(provider: String, responses: DataFrame, numResults: Int = 10): DataFrame = {
    val spec = specs.getOrElse(provider,
      throw new IllegalArgumentException(
        s"unknown provider '$provider' (expected one of ${providerNames.mkString(", ")})"))
    val withItems = responses.withColumn("__items",
      spec.items(from_json(col("raw"), spec.schema)))
    // ONE pass instead of a good ∪ failed union (which evaluated the whole
    // source subtree — fixture construction included — twice per
    // provider): a failed parse (__items null) pads to a single-null item
    // so the same explode emits its in-band error row, and every output
    // column branches on __failed. Semantics are unchanged and q103-
    // oracle-pinned: an EMPTY parsed array still emits nothing (explode of
    // [] yields no rows), only a null one is a failure.
    val itemType = responses.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), responses.schema)
      .select(spec.items(from_json(col("raw"), spec.schema)).as("__x"))
      .schema("__x").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType
    val failed = col("__failed")
    val item = col("__item")
    val exploded = withItems
      .select(col("query"), col("search_type"),
        col("__items").isNull.as("__failed"),
        coalesce(col("__items"),
          array(lit(null).cast(itemType))).as("__arr"))
      .select(col("query"), col("search_type"), failed,
        posexplode(col("__arr")).as(Seq("__pos", "__item")))
    val sliced =
      if (spec.clientSlice) exploded.filter(failed || col("__pos") < numResults)
      else exploded
    val rows = sliced.filter(failed || spec.url(item).isNotNull)
    val urlCol = when(!failed, spec.url(item))
    val video = when(col("search_type") === "video" && !failed,
      parseVideoUrl(urlCol))
    rows.select(
      lit(spec.name).as("provider"),
      col("query"),
      col("search_type"),
      urlCol.as("url"),
      when(!failed, spec.title(item)).as("title"),
      when(!failed, spec.snippet(item)).as("snippet"),
      when(!failed, spec.source(item)).as("source"),
      when(!failed, spec.content(item)).as("content"),
      when(!failed, spec.markdown(item)).as("markdown"),
      when(!failed, spec.score(item)).as("score"),
      video.getField("video_id").as("video_id"),
      video.getField("embed_url").as("embed_url"),
      video.getField("thumbnail_url").as("thumbnail_url"),
      when(failed, concat(lit(s"${spec.label} request failed for '"),
        col("query"), lit("': unparseable response"))).as("error"))
  }

  /** The full S9–S12 fan-out over a mixed-provider response table
    * (provider, query, search_type, raw): normalize each provider's slice
    * and union — the reference's `asyncio.gather` over providers becomes
    * a relational union of per-provider projections.
    */
  def normalizeAll(responses: DataFrame, numResults: Int = 10): DataFrame =
    providerNames.map { p =>
      normalize(p, responses.filter(col("provider") === p)
        .select(col("query"), col("search_type"), col("raw")), numResults)
    }.reduce(_ unionByName _)
}
