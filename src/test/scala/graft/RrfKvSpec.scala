package graft

import graft.operators.{Ranking, Rrf}
import graft.sources.KvBlock
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RrfKvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("RRF fuses ranked lists with k=60 (retrieve.py:153-181)") {
    // list A ranks: x(1), y(2); list B ranks: y(1), x(2)
    val df = Seq(
      ("A", "x", 0.9), ("A", "y", 0.5),
      ("B", "y", 0.8), ("B", "x", 0.4)).toDF("q", "item", "score")
    val got = Rrf.fuse(df, col("q"), col("item"), col("score"), 60, col("item"))
      .select(col("item"), round(col("rrf_score"), 10).as("s"), col("n_lists"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val expected = BigDecimal(1.0 / 61 + 1.0 / 62).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("x")._1 == expected)
    assert(got("y")._1 == expected)
    assert(got("x")._2 == 2)
  }

  test("RRF ties break deterministically") {
    val df = Seq(("A", "x", 0.5), ("A", "y", 0.5)).toDF("q", "item", "score")
    val got = Rrf.fuse(df, col("q"), col("item"), col("score"), 60, col("item"))
      .select(col("item"), col("best_rank")).as[(String, Int)].collect().toMap
    assert(got("x") == 1 && got("y") == 2)   // tie → item asc
  }

  test("top-k per group and keep-first (W2/W5)") {
    val df = Seq(("g", 1, 10), ("g", 2, 30), ("g", 3, 20), ("h", 4, 5))
      .toDF("grp", "id", "score")
    val top2 = Ranking.topKPerGroup(df, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("id").as[Int].collect().toSet
    assert(top2 == Set(2, 3, 4))
    val first = Ranking.keepFirst(df, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc))
      .select("id").as[Int].collect().toSet
    assert(first == Set(2, 4))
  }

  test("KV-block render → write partitioned → read → parse round trip (S1/S14)") {
    val out = java.nio.file.Files.createTempDirectory("kvblock").toString
    val rows = Seq(
      ("山西", 2023, "机构甲", "91140000XX"),
      ("山西", 2023, "机构乙", "91140000YY"),
      ("广东", 2024, "机构丙", "91440000ZZ")).toDF("province", "year", "name", "code")
    val blocks = rows.withColumn("block", KvBlock.renderBlock(Seq(
      "机构名称" -> col("name"), "统一社会信用代码" -> col("code"))))
    KvBlock.writePartitioned(blocks, col("block"), Seq("province", "year"), out)

    val back = KvBlock.read(spark, out + "/*/*/*.txt")
    assert(back.count() == 3)
    val parsed = back.select(
      KvBlock.field(col("kv"), "机构名称").as("name"),
      KvBlock.field(col("kv"), "统一社会信用代码").as("code"))
      .as[(String, String)].collect().toSet
    assert(parsed == Set(("机构甲", "91140000XX"), ("机构乙", "91140000YY"), ("机构丙", "91440000ZZ")))

    // layout: one directory per (province, year) — the moe_majors_split shape
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.contains("province=")))
  }

  test("KV render sanitizes newlines and the block delimiter inside values") {
    val hostile = "第一行\n第二行^_^机构类型：伪造"   // would split the record and inject a line
    val parsed = Seq(hostile).toDF("v")
      .select(KvBlock.parseBlock(KvBlock.renderBlock(Seq("备注" -> col("v")))).as("kv"))
      .select(map_entries(col("kv")).as("e"))
      .selectExpr("explode(e) as kv").selectExpr("kv.key", "kv.value")
      .as[(String, String)].collect().toMap
    assert(parsed == Map("备注" -> "第一行 第二行 机构类型：伪造"))
  }

  test("KV parser: first colon wins, both colon widths, colon-less lines dropped") {
    val block = "机构名称：某某：托育中心\nkey2: value2\nno colon line\n机构类型:营利性"
    val kv = Seq(block).toDF("b").select(KvBlock.parseBlock(col("b")).as("kv"))
      .select(map_entries(col("kv")).as("e"))
      .selectExpr("explode(e) as kv").selectExpr("kv.key", "kv.value")
      .as[(String, String)].collect().toMap
    assert(kv("机构名称") == "某某：托育中心")
    assert(kv("key2") == "value2")
    assert(kv("机构类型") == "营利性")
    assert(kv.size == 3)
  }

  test("RRF as a registered UDAF matches the native fuse (X3)") {
    graft.operators.RrfAggregator.register(spark)
    Seq(("A", "x", 1L), ("A", "y", 2L), ("B", "y", 1L), ("B", "x", 2L))
      .toDF("q", "item", "rnk").createOrReplaceTempView("ranked")
    val got = spark.sql(
      "SELECT item, ROUND(rrf_score(rnk), 10) AS s FROM ranked GROUP BY item")
      .as[(String, Double)].collect().toMap
    val expected = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("x") == expected && got("y") == expected)
  }

  test("KV parser: repeated key keeps the LAST value (dict semantics, no crash)") {
    val block = "机构名称：旧名\n备注：a\n机构名称：新名"
    val kv = Seq(block).toDF("b").select(KvBlock.parseBlock(col("b")).as("kv"))
      .select(element_at(col("kv"), "机构名称"), element_at(col("kv"), "备注"))
      .as[(String, String)].head()
    assert(kv == (("新名", "a")))
  }
}
