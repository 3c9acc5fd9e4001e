package graft

import graft.retrieval.Retrieval
import graft.sources.{Fetch, Providers}
import graft.streaming.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r7 verdict task 2 — the connector seams' EXECUTION surface, driven
  * end-to-end through injected deterministic replay clients (the q103
  * fixture discipline extended to the call path; the sandbox has no
  * sockets, so replay is the honest harness):
  *
  *   queries → Fetch.providerRequests → Fetch.execute(replay HTTP)
  *           → Providers.normalizeAll  (S9–S12; in-band error rows)
  *           → Retrieval.rerankBatched (X8; ≤batchSize-per-call, 4-dp,
  *                                      keep-fused-order-on-failure)
  *           → Sinks.kbRequests / writeToKb (S16; batching boundaries)
  *
  * Recorders live in the companion (local-mode tasks share the JVM) and
  * assert request SEQUENCE, not just content.
  */
object ReplayClientIntegrationSpec {
  import java.util.concurrent.ConcurrentLinkedQueue
  val httpLog = new ConcurrentLinkedQueue[(String, String, String)]
  val modelLog = new ConcurrentLinkedQueue[(String, Int)]
  val kbLog = new ConcurrentLinkedQueue[Seq[(String, String)]]
  val kbStreamLog = new ConcurrentLinkedQueue[Seq[(String, String)]]

  class StreamRecordingKb extends Sinks.KbClient {
    def createByText(batch: Seq[(String, String)]): Seq[String] = {
      kbStreamLog.add(batch)
      batch.map(b => s"id-${b._1}")
    }
  }

  /** Canned per-(provider, query) bodies; (jina, q_fail) throws. */
  class ReplayHttp extends Fetch.HttpClient {
    private def providerOf(url: String): String =
      if (url.contains("searchapi.io")) "searchapi"
      else if (url.contains("s.jina.ai")) "jina"
      else if (url.contains("firecrawl")) "firecrawl"
      else if (url.contains("tavily")) "tavily"
      else sys.error(s"unexpected url $url")
    private def queryOf(method: String, url: String, body: String): String =
      if (method == "GET")
        java.net.URLDecoder.decode(
          url.split("\\?q=")(1).split("&")(0), "UTF-8")
      else {
        val m = "\"(?:q|query)\"\\s*:\\s*\"([^\"]*)\"".r
        m.findFirstMatchIn(body).get.group(1)
      }
    def execute(method: String, url: String, body: String): String = {
      httpLog.add((method, url, body))
      val (p, q) = (providerOf(url), queryOf(method, url, body))
      if (p == "jina" && q == "q_fail") sys.error("replay: recorded 500")
      p match {
        case "searchapi" =>
          s"""{"organic_results":[
            {"link":"https://site.a/$q","title":"A $q","source":"SiteA","snippet":"sa"},
            {"title":"no-link skipped"},
            {"link":"https://v.douyin.com/video/987654321","title":"vid $q","snippet":"dv"}]}"""
        case "jina" =>
          s"""{"data":[
            {"url":"https://j.one/$q","title":"J1","description":"d1","content":"c1"},
            {"url":"https://j.two/$q","title":"J2","description":"d2"},
            {"url":"https://j.three/$q","title":"J3","description":"d3","content":"c3"}]}"""
        case "firecrawl" =>
          s"""{"data":{"web":[
            {"url":"https://f.one/$q","title":"F1","description":"fd","markdown":"# md"}]}}"""
        case "tavily" =>
          s"""{"results":[
            {"url":"https://t.one/$q","title":"T1","content":"tc","score":0.91}]}"""
      }
    }
  }

  class ReplayModel extends Retrieval.RerankModel {
    def score(query: String, docs: Seq[String]): Seq[Double] = {
      modelLog.add((query, docs.length))
      if (query == "degrade me") sys.error("replay: rerank endpoint down")
      docs.indices.map(i => (docs.length - i) * 0.123456)
    }
  }

  class RecordingKb extends Sinks.KbClient {
    def createByText(batch: Seq[(String, String)]): Seq[String] = {
      kbLog.add(batch)
      batch.map(b => s"id-${b._1}")
    }
  }
}

class ReplayClientIntegrationSpec extends AnyFunSuite {
  import ReplayClientIntegrationSpec._
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("S9-S12 + X8 + S16: full replay round trip") {
    httpLog.clear(); modelLog.clear(); kbLog.clear()

    // ---- fetch: request construction + sequence + error rows ------------
    val queries = Seq(
      ("托育 政策", "web"), ("q_fail", "web"), ("机构 视频", "video"))
      .toDF("query", "search_type")
    val requests = Fetch.providerRequests(queries, numResults = 2).coalesce(1)
    val expected = requests.collect().map(r =>
      (r.getAs[String]("method"), r.getAs[String]("url"),
        r.getAs[String]("body_json")))

    // the documented request model, secrets excluded (socket injects them)
    assert(expected.length == 12) // 4 providers x 3 queries
    val sapi = expected.filter(_._2.contains("searchapi.io"))
    assert(sapi.forall(_._1 == "GET") &&
      sapi.exists(_._2.endsWith("&engine=google&gl=cn&hl=zh-cn&num=2")))
    assert(sapi.exists(_._2.contains("q=%E6%89%98%E8%82%B2+%E6%94%BF%E7%AD%96")))
    assert(expected.filter(_._2.contains("s.jina.ai"))
      .exists(_._3.contains(""""gl":"CN"""")))
    assert(expected.filter(_._2.contains("firecrawl"))
      .forall(e => e._1 == "POST" && e._3.contains(""""limit":2""")))
    assert(expected.filter(_._2.contains("tavily"))
      .forall(_._3.contains(""""search_depth":"basic"""")))
    assert(expected.forall(e => !e._2.contains("api_key") &&
      !(e._3 != null && e._3.toLowerCase.contains("key"))))

    // materialize the executed frame ONCE, then assert the client saw
    // exactly the request frame, in order
    val executedDf = Fetch.execute(requests, new ReplayHttp)
    val executedRows = executedDf.collect()
    assert(httpLog.toArray(Array.empty[(String, String, String)]).toSeq ==
      expected.toSeq)
    import scala.jdk.CollectionConverters._
    val rows = Providers.normalizeAll(
      spark.createDataFrame(executedRows.toSeq.asJava, executedDf.schema)
        .select("provider", "query", "search_type", "raw"),
      numResults = 2).collect()

    // the composed harness fires each request EXACTLY once (the
    // localCheckpoint barrier — without it the 4-way union would
    // re-execute the fetch subtree per provider) and yields the same rows
    httpLog.clear()
    val composed = Fetch.fetchAndNormalize(
      queries.coalesce(1), new ReplayHttp, numResults = 2).collect()
    assert(httpLog.size == 12)
    assert(composed.map(_.toString).sorted.toSeq ==
      rows.map(_.toString).sorted.toSeq)

    // in-band error row for the recorded failure; no job failure
    val errs = rows.filter(_.getAs[String]("error") != null)
    assert(errs.map(r => (r.getAs[String]("provider"), r.getAs[String]("error"))).toSeq ==
      Seq(("jina", "Jina.ai request failed for 'q_fail': unparseable response")))
    // searchapi: no-link item skipped (2 of 3 items per query survive)
    assert(rows.count(_.getAs[String]("provider") == "searchapi") == 6)
    // jina clientSlice: 3 items, numResults=2 -> 2 rows per ok query
    assert(rows.count(r => r.getAs[String]("provider") == "jina" &&
      r.getAs[String]("error") == null) == 4)
    // video queries parse ids through the normalize layer
    val vid = rows.filter(r => r.getAs[String]("search_type") == "video" &&
      r.getAs[String]("video_id") != null)
    assert(vid.exists(_.getAs[String]("video_id") == "987654321"))

    // ---- rerank: batching cap, 4-dp rounding, degrade path ---------------
    val candsA = (1 to 120).map(i =>
      (1L, "score me", s"chunk-$i", s"doc body $i", i, 1.0 / i))
    val candsB = (1 to 5).map(i =>
      (2L, "degrade me", s"b-$i", s"b body $i", i, 2.0 / i))
    val fused = (candsA ++ candsB).toDF(
      "query_id", "query_text", "chunk_id", "content", "fused_rank", "fused_score")
    val reranked = Retrieval.rerankBatched(fused, new ReplayModel, batchSize = 100)
      .collect()

    // one model call per query, NEVER more than batchSize docs per call
    val calls = modelLog.toArray(Array.empty[(String, Int)]).toMap
    assert(calls == Map("score me" -> 100, "degrade me" -> 5))
    val a = reranked.filter(_.getLong(0) == 1L)
    assert(a.length == 100) // capped at batchSize, fused order
    assert(a.forall(_.getBoolean(4)))
    // model scores replace fused scores, rounded to 4 decimals
    val a1 = a.find(_.getInt(2) == 1).get
    assert(a1.getDouble(3) == math.rint(100 * 0.123456 * 10000) / 10000.0)
    assert(a.forall(r => r.getDouble(3) ==
      math.rint((100 - (r.getInt(2) - 1)) * 0.123456 * 10000) / 10000.0))
    // degrade: the FULL original list (uncapped), fused scores and order
    val b = reranked.filter(_.getLong(0) == 2L).sortBy(_.getInt(2))
    assert(b.length == 5 && b.forall(!_.getBoolean(4)))
    assert(b.map(_.getDouble(3)).toSeq == (1 to 5).map(i => 2.0 / i))

    // ---- KB sink: request model + batching boundaries --------------------
    val docs = rows.filter(_.getAs[String]("error") == null).take(23) match {
      case got if got.length >= 12 => // pad from rerank chunks to 23 docs
        (got.map(r => (r.getAs[String]("title"),
          Seq(r.getAs[String]("content"), r.getAs[String]("markdown"),
            r.getAs[String]("snippet")).find(_ != null).getOrElse(""))) ++
          (1 to (23 - got.length)).map(i => (s"pad-$i", s"body $i"))).take(23)
      case _ => fail("expected at least 12 normalized docs")
    }
    val docsDf = docs.toSeq.toDF("name", "text")
    val reqs = Sinks.kbRequests(docsDf, col("name"), col("text"), "ds-7")
      .collect()
    assert(reqs.forall(r =>
      r.getAs[String]("url") ==
        "https://api.dify.ai/v1/datasets/ds-7/document/create_by_text" &&
      r.getAs[String]("method") == "POST" &&
      r.getAs[String]("indexing_technique") == "high_quality" &&
      r.getAs[String]("process_mode") == "automatic"))
    val sample = reqs.head
    assert(sample.getAs[String]("body_json") ==
      s"""{"name":"${sample.getAs[String]("name")}","text":"${sample.getAs[String]("text")}","indexing_technique":"high_quality","process_rule":{"mode":"automatic"}}""")

    // single partition: deterministic 10/10/3 batch sequence
    Sinks.writeToKb(docsDf.coalesce(1), "name", "text", new RecordingKb,
      batchSize = 10)
    val batches1 = kbLog.toArray(Array.empty[Seq[(String, String)]]).toSeq
    assert(batches1.map(_.length) == Seq(10, 10, 3))
    assert(batches1.flatten.sorted == docs.toSeq.sorted)

    // multi-partition: per-partition ceil(n_p/10) calls, every batch <= 10
    kbLog.clear()
    val parts = docsDf.repartition(3)
    val perPart = parts.groupBy(spark_partition_id().as("p"))
      .count().collect().map(_.getLong(1)).toSeq
    Sinks.writeToKb(parts, "name", "text", new RecordingKb, batchSize = 10)
    val batches2 = kbLog.toArray(Array.empty[Seq[(String, String)]]).toSeq
    assert(batches2.forall(_.length <= 10))
    assert(batches2.length ==
      perPart.map(n => (n + 9) / 10).sum.toInt)
    assert(batches2.flatten.sorted == docs.toSeq.sorted)
  }

  test("S7 stream -> normalize -> admission -> KB: the composed §3.2 " +
      "orchestration under a 3-batch replay, request sequence and batch " +
      "boundaries pinned") {
    kbStreamLog.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("s7_kb_ckpt").toString
    // TWO identical paged sources unioned: every record is delivered
    // twice per trigger, so the admission stage has real work — only the
    // first copy may reach the KB. 9 pages at pagespertrigger=3 ==
    // exactly 3 data micro-batches of 3 pages x 4 records.
    def paged() = spark.readStream.format("graft-paged")
      .option("pages", "9").option("pagesize", "4")
      .option("pagespertrigger", "3").load()
    val normalized = paged().unionByName(paged())
      .select(col("credit_code").as("name"),
        concat_ws(" | ", col("name"), col("institution_type"),
          col("region_code")).as("text"))
      .dropDuplicates("name") // stateful admission across ALL batches
    val kb = new StreamRecordingKb
    val q = normalized.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // coalesce(1): one task -> deterministic 5/5/2 batch boundaries
        Sinks.writeToKb(df.coalesce(1), "name", "text", kb, batchSize = 5)
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length == 3, "expected exactly 3 data micro-batches")
    // double delivery reached the stream (24 rows/trigger), admission
    // halved it (12 new records per trigger)
    assert(dataBatches.forall(_.numInputRows == 24))

    val batches = kbStreamLog.toArray(Array.empty[Seq[(String, String)]]).toSeq
    // request sequence: per micro-batch 12 admitted rows split 5/5/2, in
    // trigger order (foreachBatch runs sequentially)
    assert(batches.map(_.length) == Seq(5, 5, 2, 5, 5, 2, 5, 5, 2))
    // every record admitted EXACTLY once across the whole run, and the
    // KB saw all 36 distinct institutions
    val names = batches.flatten.map(_._1)
    assert(names.distinct.length == names.length)
    assert(names.toSet == (0 until 36).map(id => f"91${id}%016d").toSet)
    // the normalized text rode through: name | type | region
    val sample = batches.flatten.find(_._1 == f"91${0}%016d").get
    assert(sample._2 == "托育机构_0 | 营利性 | 140000000000")
  }
}
