package graft

import graft.sources.Providers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S9–S12 normalization over RECORDED provider responses: each fixture
  * below is a replayed response body in the provider's documented shape
  * (多数据源获取链接.py:776-980); the spec pins the field maps, the
  * skip-no-url rule, jina's client-side slice, the in-band error row, and
  * the video-url enrichment. The HTTP socket is the only unexercised seam.
  */
class ProvidersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def respond(rows: (String, String, String)*) =
    rows.toSeq.toDF("query", "search_type", "raw")

  test("searchapi: organic_results map, no-link skip, source default") {
    val raw =
      """{"search_metadata":{"id":"x"},"organic_results":[
        {"link":"https://a.example/1","title":"t1","source":"SiteA","snippet":"s1"},
        {"title":"no link at all","snippet":"dropped"},
        {"link":"https://a.example/2","title":"t2","snippet":"s2"}]}"""
    val got = Providers.normalize("searchapi", respond(("q1", "web", raw)))
      .orderBy("url").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("url") == "https://a.example/1")
    assert(got(0).getAs[String]("source") == "SiteA")
    assert(got(1).getAs[String]("source") == "")          // item.get(.., "")
    assert(got(0).getAs[String]("provider") == "searchapi")
    assert(got(0).getAs[String]("content") == null)       // not a searchapi field
    assert(got.forall(_.getAs[String]("error") == null))
  }

  test("jina: description→snippet, content default, client-side slice") {
    val raw =
      """{"code":200,"data":[
        {"url":"https://j.example/1","title":"j1","description":"d1","content":"c1"},
        {"url":"https://j.example/2","title":"j2","description":"d2"},
        {"url":"https://j.example/3","title":"j3","description":"d3","content":"c3"}]}"""
    val got = Providers.normalize("jina", respond(("q2", "web", raw)), numResults = 2)
      .orderBy("url").collect()
    assert(got.length == 2)                               // [:num_results]
    assert(got(0).getAs[String]("snippet") == "d1")
    assert(got(0).getAs[String]("content") == "c1")
    assert(got(1).getAs[String]("content") == "")         // get("content","")
  }

  test("firecrawl: data.web path, markdown kept; tavily: score kept") {
    val fc = """{"success":true,"data":{"web":[
      {"url":"https://f.example/1","title":"f1","description":"fd1","markdown":"# md"}]}}"""
    val gotF = Providers.normalize("firecrawl", respond(("q3", "web", fc))).collect()
    assert(gotF.length == 1 && gotF(0).getAs[String]("markdown") == "# md")
    val tv = """{"results":[
      {"url":"https://t.example/1","title":"tv1","content":"tc1","score":0.87}],
      "response_time":1.2}"""
    val gotT = Providers.normalize("tavily", respond(("q4", "web", tv))).collect()
    assert(gotT.length == 1)
    assert(gotT(0).getAs[String]("snippet") == "tc1")
    assert(gotT(0).getAs[Double]("score") == 0.87)
  }

  test("unparseable body → single in-band error row, reference message shape") {
    for ((p, label) <- Seq("searchapi" -> "SearchAPI.io", "jina" -> "Jina.ai",
        "firecrawl" -> "Firecrawl", "tavily" -> "Tavily")) {
      val got = Providers.normalize(p, respond(("破q", "web", "{oops, not json"))).collect()
      assert(got.length == 1, p)
      assert(got(0).getAs[String]("error") ==
        s"$label request failed for '破q': unparseable response", p)
      assert(got(0).getAs[String]("url") == null, p)
      assert(got(0).getAs[String]("search_type") == "web", p)
    }
  }

  test("video search: douyin/bilibili id extraction, placeholder thumbnail") {
    val raw =
      """{"organic_results":[
        {"link":"https://v.douyin.com/video/7300000001","title":"dy"},
        {"link":"https://www.bilibili.com/video/BV1xK4y1z7Ab","title":"bl"},
        {"link":"https://other.example/v","title":"plain"}]}"""
    val got = Providers.normalize("searchapi", respond(("vq", "video", raw)))
      .orderBy("title").collect().map(r =>
        r.getAs[String]("title") ->
          (r.getAs[String]("video_id"), r.getAs[String]("embed_url"))).toMap
    assert(got("dy") == (("7300000001", "https://v.douyin.com/video/7300000001")))
    assert(got("bl") ==
      (("BV1xK4y1z7Ab", "//player.bilibili.com/player.html?bvid=BV1xK4y1z7Ab")))
    assert(got("plain") == ((null, "https://other.example/v")))
    // web search leaves the video columns null
    val web = Providers.normalize("searchapi", respond(("vq", "web", raw))).collect()
    assert(web.forall(_.getAs[String]("thumbnail_url") == null))
  }

  test("normalizeAll: mixed-provider table → one normalized union") {
    val mixed = Seq(
      ("searchapi", "qa", "web",
        """{"organic_results":[{"link":"https://a/1","title":"a"}]}"""),
      ("jina", "qb", "web",
        """{"data":[{"url":"https://b/1","title":"b","description":"db"}]}"""),
      ("firecrawl", "qc", "web",
        """{"data":{"web":[{"url":"https://c/1","title":"c"}]}}"""),
      ("tavily", "qd", "web",
        """{"results":[{"url":"https://d/1","title":"d","content":"cd","score":0.5}]}"""),
      ("tavily", "qe", "web", "garbage"))
      .toDF("provider", "query", "search_type", "raw")
    val got = Providers.normalizeAll(mixed)
    assert(got.schema.fieldNames.toSeq == Providers.resultSchema.fieldNames.toSeq)
    assert(got.count() == 5)
    assert(got.filter(col("error").isNotNull).count() == 1)
    assert(got.select("provider").distinct().count() == 4)
  }
}
