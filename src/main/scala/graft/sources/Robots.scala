package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt (RFC 9309) parsing and URL permission evaluation — the
  * compliance gate every crawl pipeline needs in front of its fetch fan-out
  * (the reference fetches search-provider links directly, LINKS:776-980;
  * a web-scale crawler must consult the target's robots policy first).
  *
  * Parser semantics, from the RFC:
  *  - `field: value` lines, field names case-insensitive, `#` comments
  *    stripped, unknown fields ignored;
  *  - consecutive `User-agent` lines share the following rule block (a
  *    group with several agents); a `User-agent` after rules starts a new
  *    group; `Sitemap` is global (not group-scoped);
  *  - rule paths may carry `*` wildcards and a `$` end anchor.
  *
  * Evaluation (`allowedUrls`):
  *  - group selection per domain: the agent's own group when one exists,
  *    else the `*` group (RFC most-specific-match, restricted to
  *    exact-name-or-star — full product-token prefix matching is a data
  *    change, not a shape change);
  *  - among matching rules the LONGEST path pattern wins, allow beating
  *    disallow on equal length; no matching rule → allowed.
  *
  * The rules side is domain-bounded (a few rows per domain) and
  * broadcasts; URL evaluation is then a broadcast join + one keyed window
  * — no URL-side shuffle at any corpus scale.
  */
object Robots {

  /** Parse (domain, content) robots.txt files into one row per directive:
    * (domain, group_idx, agent, rule_type, value, rule_idx). Group-scoped
    * rule types: allow / disallow / crawl-delay (one row per agent of the
    * group); global: sitemap (agent null, group_idx -1).
    */
  def parseRobots(files: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("domain", StringType, nullable = false),
      StructField("group_idx", IntegerType, nullable = false),
      StructField("agent", StringType, nullable = true),
      StructField("rule_type", StringType, nullable = false),
      StructField("value", StringType, nullable = false),
      StructField("rule_idx", IntegerType, nullable = false)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    files.select(col("domain"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val domain = r.getString(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          var agents = List.empty[String]
          var groupIdx = -1
          var inAgentRun = false
          var ruleIdx = 0
          Option(r.getString(1)).getOrElse("").split("\r?\n").foreach { raw =>
            val line = raw.takeWhile(_ != '#').trim
            val ci = line.indexOf(':')
            if (ci > 0) {
              val field = line.substring(0, ci).trim.toLowerCase
              val value = line.substring(ci + 1).trim
              field match {
                case "user-agent" =>
                  if (!inAgentRun) { agents = Nil; groupIdx += 1; inAgentRun = true }
                  agents ::= value.toLowerCase
                case "allow" | "disallow" | "crawl-delay" =>
                  inAgentRun = false
                  if (value.nonEmpty || field == "disallow") {
                    // empty Disallow = "allow everything" → no rule row
                    if (value.nonEmpty) {
                      agents.reverse.foreach { a =>
                        out += Row(domain, groupIdx, a, field, value, ruleIdx)
                      }
                      ruleIdx += 1
                    }
                  }
                case "sitemap" =>
                  inAgentRun = false
                  if (value.nonEmpty) {
                    out += Row(domain, -1, null, "sitemap", value, ruleIdx)
                    ruleIdx += 1
                  }
                case _ => inAgentRun = false
              }
            }
          }
          out
        }
      }(encoder)
  }

  /** Translate a robots path pattern (`*` wildcard, optional trailing `$`
    * anchor) into a Java/RE2-safe regex column anchored at the path start.
    */
  private[sources] def patternRegex(path: Column): Column = {
    val anchored = path.endsWith("$")
    val body = when(anchored, path.substr(lit(1), length(path) - 1)).otherwise(path)
    // escape regex metacharacters, then reopen '*' as '.*'
    val escaped = regexp_replace(body, "([.^$+?(){}\\[\\]\\\\|])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Evaluate URL permissions for one crawler agent.
    * @param urls  (idCol, domainCol, pathCol)
    * @param rules `parseRobots` output for the same domains
    * @return urls + (agent_group, allowed) — agent_group is the group the
    *         decision came from ("*" or the agent), allowed 1/0.
    */
  def allowedUrls(
      urls: DataFrame, id: Column, domain: Column, path: Column,
      rules: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase
    val g = rules
      .filter(col("rule_type").isin("allow", "disallow"))
      .filter(col("agent") === a || col("agent") === "*")
    // per-domain: prefer the agent's own group over '*'
    val pick = Window.partitionBy(col("domain"))
    val picked = g
      .withColumn("__exact", max(when(col("agent") === a, 1).otherwise(0)).over(pick))
      .filter((col("agent") === a && col("__exact") === 1) ||
        (col("agent") === "*" && col("__exact") === 0))
      .select(col("domain").as("__rd"),
        when(col("__exact") === 1, lit(a)).otherwise(lit("*")).as("agent_group"),
        col("rule_type"), col("value"),
        length(col("value")).as("__rlen"),
        patternRegex(col("value")).as("__re"))
    val joined = urls
      .join(broadcast(picked),
        domain === col("__rd") && regexp_like(path, col("__re")), "left")
    val w = Window.partitionBy(id)
      .orderBy(col("__rlen").desc_nulls_last,
        when(col("rule_type") === "allow", 1).otherwise(0).desc,
        col("value").asc_nulls_last)
    joined
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .withColumn("allowed",
        when(col("rule_type").isNull || col("rule_type") === "allow", 1)
          .otherwise(0).cast("int"))
      .withColumn("agent_group", coalesce(col("agent_group"), lit("*")))
      .drop("__rd", "__re", "__rlen", "__rk", "rule_type", "value")
  }
}
