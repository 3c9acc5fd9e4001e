package graft.dims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Region dimension + resolution/match semantics (retrieve.py:1027-1195 —
  * J3/P6/X5): free-text locations resolve against a province→cities
  * dimension with longest-city-first matching and province↔city
  * disambiguation; a region RULE matches a document location when
  *  - city rule: exact city match;
  *  - province rule: the location's city belongs to that province (or the
  *    location names the province itself);
  *  - unresolvable rule: substring containment fallback.
  *
  * The dimension here is a representative public-geography subset (the
  * shape is what matters — swap in a full table the same way); always
  * broadcast, suffix-normalized (省/市/自治区 stripped) before matching.
  */
object Regions {

  /** province → cities (public geography, subset). */
  val ProvinceCities: Map[String, Seq[String]] = Map(
    "北京" -> Seq("北京"),
    "上海" -> Seq("上海"),
    "天津" -> Seq("天津"),
    "江苏" -> Seq("南京", "苏州", "无锡", "泰州", "兴化"),
    "浙江" -> Seq("杭州", "宁波", "温州"),
    "广东" -> Seq("广州", "深圳", "珠海", "佛山"),
    "山西" -> Seq("太原", "大同", "晋中"),
    "吉林" -> Seq("长春", "吉林市"),   // 吉林 is both province and city — the
    "四川" -> Seq("成都", "绵阳"))     // reference's special case (1139-1146)

  /** Strip administrative suffixes (retrieve.py:1074-1093 — F7). */
  def normalizeRegion(c: Column): Column =
    regexp_replace(c, "(省|市|区|县|自治区|自治州|特别行政区)$", "")

  def cityDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ProvinceCities.toSeq
      .flatMap { case (p, cs) => cs.map(c => (p, c)) }
      .toDF("province", "city")
  }

  /** Resolve free-text locations: longest contained city wins (city implies
    * its province); falls back to a contained province name; else nulls.
    * Returns the input plus (province, city) columns. Dimension broadcast,
    * fact side untouched — one narrow pass + keep-first window.
    */
  def resolve(locs: DataFrame, locCol: String): DataFrame = {
    val spark = locs.sparkSession
    import spark.implicits._
    val cities = broadcast(cityDim(spark))
    val provs = broadcast(ProvinceCities.keys.toSeq.toDF("province_only"))
    // row identity, not the loc string: two input rows with the SAME
    // location text must both survive resolution
    val withId = locs.withColumn("__rid", monotonically_increasing_id())
    val byCity = withId.join(cities, col(locCol).contains(col("city")), "left")
    val cityPick = graft.operators.Ranking.keepFirst(
      byCity, Seq(col("__rid")),
      Seq(length(col("city")).desc_nulls_last, col("city").asc_nulls_last))
    val withProv = cityPick.join(provs,
        col("city").isNull && col(locCol).contains(col("province_only")), "left")
    graft.operators.Ranking.keepFirst(
        withProv, Seq(col("__rid")),
        Seq(length(col("province_only")).desc_nulls_last, col("province_only").asc_nulls_last))
      .withColumn("province", coalesce(col("province"), col("province_only")))
      .drop("province_only", "__rid")
  }

  /** P6/X5 — region-rule predicate over RESOLVED columns: call after
    * `resolve` on both the rule and the document location.
    */
  def regionMatch(
      ruleProvince: Column, ruleCity: Column,
      docProvince: Column, docCity: Column,
      ruleRaw: Column, docRaw: Column): Column =
    when(ruleCity.isNotNull, ruleCity === docCity)
      .when(ruleProvince.isNotNull, ruleProvince === docProvince)
      .otherwise(docRaw.contains(ruleRaw))   // unresolvable → substring
}
