package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S9–S12 fetch EXECUTION harness (多数据源获取链接.py:776-980) — the last
  * untested surface of the connector seams (r7 verdict): request
  * construction and request execution as real, spec-driven machinery
  * around an injected client, with only the socket itself external.
  *
  * [[providerRequests]] renders the reference's documented request model
  * per provider — method, URL (query params rendered in-URL for the GET
  * provider), JSON body for the POST providers:
  *
  *   searchapi  GET  www.searchapi.io/api/v1/search?q=…&engine=google&gl=cn&hl=zh-cn&num=N
  *   jina       POST s.jina.ai/          {"q":…,"gl":"CN","hl":"zh-cn"}
  *   firecrawl  POST api.firecrawl.dev/v2/search {"query":…,"limit":N}
  *   tavily     POST api.tavily.com/search {"query":…,"search_depth":"basic","max_results":N}
  *
  * Auth material (api_key param, bearer/accept headers) is deliberately
  * NOT in the frame — same rule as [[graft.streaming.Sinks.kbRequests]]:
  * secrets don't belong in shuffle files or query results; the client
  * injects them at the socket (the reference reads them from env vars at
  * the same layer).
  *
  * [[execute]] runs the requests through the injected [[HttpClient]] —
  * one client per partition, requests in partition order (the
  * deterministic analog of the reference's per-provider sequential
  * awaits; providers parallelize across partitions like its
  * `asyncio.gather`). A client failure yields `raw = null`, which
  * [[Providers.normalize]] turns into the reference's single in-band
  * error row — errors are DATA here, never job failures (LINKS:873-875).
  */
object Fetch {

  /** The socket seam: execute one request, return the body, throw on
    * failure. Implementations must be serializable (constructed on the
    * driver, used inside tasks); zero-egress tests inject a replay
    * client, production injects a real HTTP stack plus secrets.
    */
  trait HttpClient extends Serializable {
    def execute(method: String, url: String, body: String): String
  }

  /** One row per (provider × query): provider, query, search_type,
    * method, url, body_json (null for the GET provider).
    */
  def providerRequests(
      queries: DataFrame, numResults: Int = 10,
      providers: Seq[String] = Providers.providerNames): DataFrame = {
    require(queries.columns.contains("query") &&
      queries.columns.contains("search_type"),
      s"queries must carry (query, search_type), got ${queries.columns.mkString(",")}")
    val q = col("query")
    val frames = providers.map {
      case "searchapi" => queries.select(
        lit("searchapi").as("provider"), q, col("search_type"),
        lit("GET").as("method"),
        concat(lit("https://www.searchapi.io/api/v1/search?q="),
          url_encode(q),
          lit(s"&engine=google&gl=cn&hl=zh-cn&num=$numResults")).as("url"),
        lit(null).cast(StringType).as("body_json"))
      case "jina" => queries.select(
        lit("jina").as("provider"), q, col("search_type"),
        lit("POST").as("method"),
        lit("https://s.jina.ai/").as("url"),
        to_json(struct(q.as("q"), lit("CN").as("gl"),
          lit("zh-cn").as("hl"))).as("body_json"))
      case "firecrawl" => queries.select(
        lit("firecrawl").as("provider"), q, col("search_type"),
        lit("POST").as("method"),
        lit("https://api.firecrawl.dev/v2/search").as("url"),
        to_json(struct(q.as("query"),
          lit(numResults).as("limit"))).as("body_json"))
      case "tavily" => queries.select(
        lit("tavily").as("provider"), q, col("search_type"),
        lit("POST").as("method"),
        lit("https://api.tavily.com/search").as("url"),
        to_json(struct(q.as("query"), lit("basic").as("search_depth"),
          lit(numResults).as("max_results"))).as("body_json"))
      case other => throw new IllegalArgumentException(
        s"unknown provider '$other' (expected one of ${Providers.providerNames.mkString(", ")})")
    }
    frames.reduce(_ unionByName _)
  }

  /** Execute a request frame through the injected client: input columns
    * + `raw` (the response body; null on client failure). One client per
    * partition, rows in partition order.
    */
  def execute(requests: DataFrame, client: HttpClient): DataFrame = {
    val schema = requests.schema.add(StructField("raw", StringType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val mi = requests.schema.fieldIndex("method")
    val ui = requests.schema.fieldIndex("url")
    val bi = requests.schema.fieldIndex("body_json")
    requests.mapPartitions { it =>
      it.map { r =>
        val raw =
          try client.execute(r.getString(mi), r.getString(ui), r.getString(bi))
          catch { case scala.util.control.NonFatal(_) => null }
        Row.fromSeq(r.toSeq :+ raw)
      }
    }(enc)
  }

  /** End-to-end S9–S12: request frame → client execution → normalized
    * result rows ([[Providers.resultSchema]], in-band error rows for
    * failed fetches). The executed frame is materialized eagerly
    * (localCheckpoint) BEFORE normalization: normalizeAll is a union of
    * four per-provider branches, and without the barrier each branch
    * would re-execute the fetch subtree — a side-effecting client would
    * fire every request once per provider (4×). The integration spec
    * pins exactly-once execution through the recorder client.
    */
  def fetchAndNormalize(
      queries: DataFrame, client: HttpClient, numResults: Int = 10,
      providers: Seq[String] = Providers.providerNames): DataFrame =
    Providers.normalizeAll(
      execute(providerRequests(queries, numResults, providers), client)
        .select(col("provider"), col("query"), col("search_type"), col("raw"))
        .localCheckpoint(eager = true),
      numResults)
}
