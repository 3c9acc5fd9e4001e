package graft

import graft.sources.Robots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rules(content: String) =
    Robots.parseRobots(Seq(("d.com", content)).toDF("domain", "content"))

  test("parse: groups, comments, mixed-case fields, global sitemap") {
    val txt = """# hello
      |User-AGENT: *
      |Disallow: /a/   # trailing comment
      |ALLOW: /a/b
      |Crawl-Delay: 7
      |
      |User-agent: botx
      |Disallow: /x/
      |Sitemap: https://d.com/s.xml
      |Unknown-Field: whatever""".stripMargin
    val rs = rules(txt).collect()
    val byType = rs.groupBy(_.getAs[String]("rule_type"))
    assert(byType("disallow").map(r =>
      (r.getAs[String]("agent"), r.getAs[String]("value"))).toSet ==
      Set(("*", "/a/"), ("botx", "/x/")))
    assert(byType("allow").head.getAs[String]("value") == "/a/b")
    assert(byType("crawl-delay").head.getAs[String]("value") == "7")
    val sm = byType("sitemap").head
    assert(sm.getAs[String]("value") == "https://d.com/s.xml")
    assert(sm.get(sm.fieldIndex("agent")) == null)
    // two groups
    assert(rs.filter(r => r.getAs[String]("rule_type") != "sitemap")
      .map(_.getAs[Int]("group_idx")).toSet == Set(0, 1))
  }

  test("parse: consecutive User-agent lines share one rule block") {
    val txt = "User-agent: a\nUser-agent: b\nDisallow: /q/\n"
    val rs = rules(txt).collect()
    assert(rs.map(r => (r.getAs[String]("agent"), r.getAs[String]("value"))).toSet ==
      Set(("a", "/q/"), ("b", "/q/")))
    assert(rs.map(_.getAs[Int]("group_idx")).toSet == Set(0))
  }

  test("parse: empty Disallow (allow-everything idiom) emits no rule") {
    assert(rules("User-agent: *\nDisallow:\n").count() == 0)
  }

  private def judge(content: String, paths: Seq[String], agent: String) = {
    val urls = paths.zipWithIndex.map { case (p, i) => (i.toLong, "d.com", p) }
      .toDF("id", "domain", "path")
    Robots.allowedUrls(urls, col("id"), col("domain"), col("path"),
        rules(content), agent)
      .orderBy("id").select("path", "allowed", "agent_group").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
  }

  test("longest pattern wins; allow beats disallow on ties; default allow") {
    val txt = """User-agent: *
      |Disallow: /shop/
      |Allow: /shop/sale
      |Disallow: /shop/sale$
      |""".stripMargin
    // /shop/sale: allow(10) vs disallow-$(11) → $-anchored rule is longer → deny
    // /shop/sale2: allow(10) matches, $-rule does not → allow
    // /shop/x: only /shop/ → deny ; /other: nothing → allow
    val got = judge(txt, Seq("/shop/sale", "/shop/sale2", "/shop/x", "/other"), "any")
    assert(got.map(g => (g._1, g._2)).toSeq == Seq(
      ("/shop/sale", 0), ("/shop/sale2", 1), ("/shop/x", 0), ("/other", 1)))
  }

  test("wildcard patterns match across segments; dots stay literal") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp/*/x\n"
    val got = judge(txt,
      Seq("/docs/a.pdf", "/docs/apdf", "/tmp/1/x", "/tmp/x"), "any")
    assert(got.map(g => (g._1, g._2)).toSeq == Seq(
      ("/docs/a.pdf", 0),  // *.pdf$ matches
      ("/docs/apdf", 1),   // '.' is literal, not regex-any
      ("/tmp/1/x", 0),
      ("/tmp/x", 1)))
  }

  test("agent-specific group shadows *; unknown agent falls back to *") {
    val txt = """User-agent: *
      |Disallow: /all/
      |User-agent: graftbot
      |Disallow: /bot/
      |""".stripMargin
    val bot = judge(txt, Seq("/all/x", "/bot/x"), "GraftBot")
    assert(bot.toSeq == Seq(
      ("/all/x", 1, "*"),          // no match in graftbot's group → default allow
      ("/bot/x", 0, "graftbot")))
    val other = judge(txt, Seq("/all/x", "/bot/x"), "crawler9")
    assert(other.map(g => (g._1, g._2)).toSeq ==
      Seq(("/all/x", 0), ("/bot/x", 1)))
  }
}
