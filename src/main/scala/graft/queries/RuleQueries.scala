package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining rule/join/agg shapes from SURVEY §2: education-level
  * normalization with longest-substring fallback (P7/X6), case-insensitive
  * multi-variant key join (J6), max-width row padding (A8), and
  * union-then-regroup (U2).
  */
object RuleQueries {

  /** EDUCATION_MAP analog (retrieve.py:1000-1023): exact lookup first, then
    * longest-contained-key fallback, else passthrough.
    */
  val EducationMap: Seq[(String, String)] = Seq(
    "高中" -> "高中", "专科" -> "大专", "大专" -> "大专", "本科" -> "本科",
    "硕士" -> "硕士研究生", "博士" -> "博士研究生")

  def normalizeEducation(c: Column): Column = {
    val exact = EducationMap.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, v).otherwise(acc)
    }
    // longest key first so 硕士研究生-style strings hit the longest match
    val bySize = EducationMap.sortBy(-_._1.length)
    val contained = bySize.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      coalesce(acc, when(c.contains(k), v))
    }
    coalesce(exact, contained, c)
  }

  /** q202's synthetic contract: the draft-07 keywords the reference
    * schema doesn't use, each with a dirt mode. Pattern stays in the
    * RE2∩Java subset (standing oracle rule).
    */
  private val KeywordSchema = graft.operators.SchemaValidate.parseSchema(
    """{"type":"object","required":["sku","qty"],"properties":{
      "sku":{"type":"string","pattern":"^[A-Z]{3}-[0-9]+$"},
      "qty":{"type":"integer","minimum":1,"maximum":100},
      "tags":{"type":"array","minItems":1,"maxItems":3,
        "items":{"type":"string","minLength":2,"maxLength":8}},
      "note":{"type":"string","minLength":3,"maxLength":6}}}""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Schema-as-contract (SURVEY §1.3/§5, survey_schema.json:1-60): the
    // reference's draft-07 survey schema compiled to ONE variant
    // expression; deliberately-dirtied records (7 modes: valid, enum
    // breach, missing required, int-as-string, bool-as-string + json
    // null, items-enum breach, maxItems breach) flow through and come
    // out with in-band violation arrays — invalid rows are data, not
    // exceptions. The DuckDB twin is GENERATED from the same compiled
    // model (SchemaValidate.violationsListSql), so both sides replay
    // the identical check set.
    "q201_schema_validate" -> ((s, dir) => {
      import graft.operators.SchemaValidate
      val k = col("c_custkey")
      val mode = pmod(k, lit(7))
      val subj = element_at(
        typedLit(Seq("公办", "民办", "公办民营/民办公助")),
        (pmod(k, lit(3)) + 1).cast("int"))
      val edu = element_at(
        typedLit(Seq("中职/高中", "高职专科", "高职本科", "普通本科", "硕士")),
        (pmod(k, lit(5)) + 1).cast("int"))
      val cap = (lit(20) + pmod(k, lit(30))).cast("string")
      val json = concat(
        lit("{\"institution_info\":{"),
        when(mode === 2, lit(""))
          .otherwise(concat(lit("\"name\":\""), col("c_name"), lit("\","))),
        lit("\"city\":\"city"), pmod(k, lit(10)).cast("string"), lit("\","),
        lit("\"subject_type\":\""),
        when(mode === 1, lit("私立")).otherwise(subj), lit("\","),
        lit("\"specific_form\":\"独立托育机构\","),
        lit("\"is_puhui\":"),
        when(mode === 4, lit("\"yes\""))
          .otherwise(when(pmod(k, lit(2)) === 0, lit("true")).otherwise(lit("false"))),
        lit(","),
        lit("\"service_modes\":[\"全日托\",\""),
        when(mode === 5, lit("夜托")).otherwise(lit("计时托")), lit("\"],"),
        lit("\"total_capacity\":"),
        when(mode === 3, concat(lit("\""), cap, lit("\""))).otherwise(cap), lit(","),
        lit("\"current_enrollment\":"), pmod(k, lit(50)).cast("string"), lit(","),
        lit("\"staff_count\":"), pmod(k, lit(20)).cast("string"),
        lit("},\"personal_info\":{"),
        lit("\"gender\":\""),
        when(pmod(k, lit(2)) === 0, lit("男")).otherwise(lit("女")), lit("\","),
        lit("\"education\":\""), edu, lit("\","),
        lit("\"major\":"),
        when(mode === 4, lit("null")).otherwise(lit("\"护理\"")),
        lit("},\"employment_info\":{"),
        lit("\"current_position\":\"保育员\","),
        lit("\"job_change_interval\":\"1-3年\","),
        lit("\"salary_range\":\"3k-5k\","),
        lit("\"is_kindergarten_transition\":"),
        when(pmod(k, lit(2)) === 1, lit("true")).otherwise(lit("false")), lit(","),
        lit("\"job_change_reasons\":[\"薪资\",\"通勤\""),
        when(mode === 6, lit(",\"发展\",\"家庭\"")).otherwise(lit("")), lit("]"),
        lit("}}"))
      val rec = Tables.load(s, dir, "customer")
        .select(k.as("id"), mode.as("mode"), json.as("j"))
      SchemaValidate.validate(rec, col("j"), SchemaValidate.surveySchema)
        .select(col("id"), col("mode"),
          size(col("violations")).as("n_viol"),
          array_join(col("violations"), "|").as("viol"),
          col("is_valid"))
    }),

    // The rest of the draft-07 validation vocabulary (pattern, minItems,
    // minimum/maximum, minLength/maxLength) on the oracle surface: a
    // synthetic contract over 8 dirt modes, with the DuckDB twin again
    // GENERATED from the same compiled model.
    "q202_schema_keywords" -> ((s, dir) => {
      import graft.operators.SchemaValidate
      val k = col("c_custkey")
      val mode = pmod(k, lit(8))
      val json = concat(
        lit("{\"sku\":\""),
        when(mode === 1, lit("abc-12"))
          .otherwise(concat(lit("ABC-"), k.cast("string"))),
        lit("\""),
        when(mode === 6, lit(""))
          .otherwise(concat(lit(",\"qty\":"),
            when(mode === 2, lit("0")).when(mode === 3, lit("101"))
              .otherwise((pmod(k, lit(100)) + 1).cast("string")))),
        lit(",\"tags\":"),
        when(mode === 4, lit("[]"))
          .when(mode === 5, lit("[\"a\"]"))
          .otherwise(lit("[\"aa\",\"bb\"]")),
        lit(",\"note\":\""),
        when(mode === 7, lit("toolong")).otherwise(lit("hey")),
        lit("\"}"))
      val rec = Tables.load(s, dir, "customer")
        .select(k.as("id"), mode.as("mode"), json.as("j"))
      SchemaValidate.validate(rec, col("j"), KeywordSchema)
        .select(col("id"), col("mode"),
          size(col("violations")).as("n_viol"),
          array_join(col("violations"), "|").as("viol"),
          col("is_valid"))
    }),

    // P7/X6: education normalization over synthesized degree strings.
    "q52_education_normalize" -> ((s, dir) => {
      val raw = element_at(
        typedLit(Seq("本科", "本科(全日制)", "硕士研究生", "专科学历", "博士", "其他", "高中毕业")),
        (pmod(col("c_custkey"), lit(7)) + 1).cast("int"))
      Tables.load(s, dir, "customer")
        .withColumn("edu_raw", raw)
        .withColumn("edu_norm", normalizeEducation(col("edu_raw")))
        .groupBy(col("edu_raw"), col("edu_norm"))
        .agg(count(lit(1)).as("n"))
    }),

    // J6: image-relationship join — case-insensitive basename with
    // with/without-extension variants (多数据源获取数据.py:786-821).
    "q53_image_rel_join" -> ((s, dir) => {
      val part = Tables.load(s, dir, "part")
      val refs = part.select(col("p_partkey"),
        concat(lit("rId"), col("p_partkey")).as("rid"),
        when(pmod(col("p_partkey"), lit(3)) === 0,
            concat(lit("IMG_"), col("p_partkey"), lit(".PNG")))
          .when(pmod(col("p_partkey"), lit(3)) === 1,
            concat(lit("img_"), col("p_partkey")))
          .otherwise(concat(lit("Img_"), col("p_partkey"), lit(".jpeg"))).as("ref_name"))
      val uploads = part.select(
        concat(lit("img_"), col("p_partkey"), lit(".png")).as("file_name"),
        concat(lit("https://cdn.example.com/"), col("p_partkey")).as("url"))
      val key = (c: Column) => lower(regexp_replace(c, "\\.[A-Za-z0-9]+$", ""))
      refs.join(uploads, key(col("ref_name")) === key(col("file_name")), "left")
        .select(col("p_partkey"), col("rid"), col("ref_name"), col("url"))
    }),

    // A8: pad per-order item lists to the global max width (DATA:1066-1067).
    // The scalar max arrives via agg + broadcast cross-join — a two-level
    // (partial/final) aggregation plus a 1-row broadcast, never the
    // single-partition `max().over(Window.partitionBy())` plan that would
    // funnel every row through one task at scale.
    "q54_pad_rows" -> ((s, dir) => {
      val rows = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("cells"))
      val maxW = rows.agg(max(size(col("cells"))).as("max_w"))
      val withMax = rows.crossJoin(broadcast(maxW))
      withMax.select(
        col("l_orderkey"),
        concat_ws("|",
          concat(transform(col("cells"), c => c.cast("string")),
            array_repeat(lit("-"), (col("max_w") - size(col("cells"))).cast("int")))).as("padded"),
        col("max_w"))
    }),

    // U2: union of two result sets, then regrouped per customer (the
    // RAG-results ∪ full-doc-results merge, retrieve.py:1785-1808).
    "q55_union_regroup" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val highValue = o.filter(col("o_totalprice") > 350000)
        .select(col("o_custkey"), col("o_orderkey"), lit("high_value").as("src"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"), lit("urgent").as("src"))
      highValue.unionByName(urgent)
        .groupBy(col("o_custkey"), col("o_orderkey"))
        .agg(array_join(sort_array(collect_list(col("src"))), "+").as("srcs"))
        .groupBy(col("o_custkey"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("o_orderkey"), col("srcs")))),
            x => concat(x.getField("o_orderkey").cast("string"), lit("="),
              x.getField("srcs"))), ";").as("merged"),
          count(lit(1)).as("n_orders"))
    }))

  val oracles: Map[String, String] = Map(
    "q202_schema_keywords" -> {
      val viol = graft.operators.SchemaValidate.violationsListSql(
        "j", KeywordSchema)
      s"""WITH rec AS (SELECT c_custkey AS id, c_custkey % 8 AS mode,
           CAST('{"sku":"' ||
             CASE WHEN c_custkey % 8 = 1 THEN 'abc-12'
                  ELSE 'ABC-' || CAST(c_custkey AS VARCHAR) END || '"' ||
             CASE WHEN c_custkey % 8 = 6 THEN ''
                  ELSE ',"qty":' ||
                    CASE WHEN c_custkey % 8 = 2 THEN '0'
                         WHEN c_custkey % 8 = 3 THEN '101'
                         ELSE CAST(c_custkey % 100 + 1 AS VARCHAR) END END ||
             ',"tags":' ||
               CASE WHEN c_custkey % 8 = 4 THEN '[]'
                    WHEN c_custkey % 8 = 5 THEN '["a"]'
                    ELSE '["aa","bb"]' END ||
             ',"note":"' ||
               CASE WHEN c_custkey % 8 = 7 THEN 'toolong' ELSE 'hey' END ||
             '"}' AS JSON) AS j
         FROM customer),
         v AS (SELECT id, mode, $viol AS viols FROM rec)
         SELECT id, mode, CAST(len(viols) AS INTEGER) AS n_viol,
           COALESCE(array_to_string(viols, '|'), '') AS viol,
           len(viols) = 0 AS is_valid
         FROM v"""
    },
    "q201_schema_validate" -> {
      // the violation list is GENERATED from the same compiled schema
      // model the Spark side uses — the twin cannot drift by hand-editing
      val viol = graft.operators.SchemaValidate.violationsListSql(
        "j", graft.operators.SchemaValidate.surveySchema)
      s"""WITH rec AS (SELECT c_custkey AS id, c_custkey % 7 AS mode,
           CAST('{"institution_info":{' ||
             CASE WHEN c_custkey % 7 = 2 THEN ''
                  ELSE '"name":"' || c_name || '",' END ||
             '"city":"city' || CAST(c_custkey % 10 AS VARCHAR) || '",' ||
             '"subject_type":"' ||
               CASE WHEN c_custkey % 7 = 1 THEN '私立'
                    ELSE (['公办','民办','公办民营/民办公助'])[(c_custkey % 3) + 1] END
               || '",' ||
             '"specific_form":"独立托育机构",' ||
             '"is_puhui":' ||
               CASE WHEN c_custkey % 7 = 4 THEN '"yes"'
                    WHEN c_custkey % 2 = 0 THEN 'true' ELSE 'false' END || ',' ||
             '"service_modes":["全日托","' ||
               CASE WHEN c_custkey % 7 = 5 THEN '夜托' ELSE '计时托' END || '"],' ||
             '"total_capacity":' ||
               CASE WHEN c_custkey % 7 = 3
                    THEN '"' || CAST(20 + c_custkey % 30 AS VARCHAR) || '"'
                    ELSE CAST(20 + c_custkey % 30 AS VARCHAR) END || ',' ||
             '"current_enrollment":' || CAST(c_custkey % 50 AS VARCHAR) || ',' ||
             '"staff_count":' || CAST(c_custkey % 20 AS VARCHAR) ||
             '},"personal_info":{' ||
             '"gender":"' || CASE WHEN c_custkey % 2 = 0 THEN '男' ELSE '女' END || '",' ||
             '"education":"' ||
               (['中职/高中','高职专科','高职本科','普通本科','硕士'])[(c_custkey % 5) + 1]
               || '",' ||
             '"major":' ||
               CASE WHEN c_custkey % 7 = 4 THEN 'null' ELSE '"护理"' END ||
             '},"employment_info":{' ||
             '"current_position":"保育员",' ||
             '"job_change_interval":"1-3年",' ||
             '"salary_range":"3k-5k",' ||
             '"is_kindergarten_transition":' ||
               CASE WHEN c_custkey % 2 = 1 THEN 'true' ELSE 'false' END || ',' ||
             '"job_change_reasons":["薪资","通勤"' ||
               CASE WHEN c_custkey % 7 = 6 THEN ',"发展","家庭"' ELSE '' END || ']' ||
             '}}' AS JSON) AS j
         FROM customer),
         v AS (SELECT id, mode, $viol AS viols FROM rec)
         SELECT id, mode, CAST(len(viols) AS INTEGER) AS n_viol,
           COALESCE(array_to_string(viols, '|'), '') AS viol,
           len(viols) = 0 AS is_valid
         FROM v"""
    },
    "q52_education_normalize" ->
      """WITH m AS (SELECT c_custkey,
           (['本科','本科(全日制)','硕士研究生','专科学历','博士','其他','高中毕业'])[(c_custkey % 7) + 1] AS edu_raw
         FROM customer),
         n AS (SELECT edu_raw,
           CASE edu_raw WHEN '高中' THEN '高中' WHEN '专科' THEN '大专'
             WHEN '大专' THEN '大专' WHEN '本科' THEN '本科'
             WHEN '硕士' THEN '硕士研究生' WHEN '博士' THEN '博士研究生'
           ELSE
             CASE WHEN POSITION('高中' IN edu_raw) > 0 THEN '高中'
                  WHEN POSITION('专科' IN edu_raw) > 0 THEN '大专'
                  WHEN POSITION('大专' IN edu_raw) > 0 THEN '大专'
                  WHEN POSITION('本科' IN edu_raw) > 0 THEN '本科'
                  WHEN POSITION('硕士' IN edu_raw) > 0 THEN '硕士研究生'
                  WHEN POSITION('博士' IN edu_raw) > 0 THEN '博士研究生'
                  ELSE edu_raw END
           END AS edu_norm
         FROM m)
         SELECT edu_raw, edu_norm, COUNT(*) AS n FROM n GROUP BY 1, 2""",
    "q53_image_rel_join" ->
      """WITH refs AS (SELECT p_partkey, 'rId' || p_partkey AS rid,
           CASE p_partkey % 3 WHEN 0 THEN 'IMG_' || p_partkey || '.PNG'
                              WHEN 1 THEN 'img_' || p_partkey
                              ELSE 'Img_' || p_partkey || '.jpeg' END AS ref_name
         FROM part),
         ups AS (SELECT 'img_' || p_partkey || '.png' AS file_name,
           'https://cdn.example.com/' || p_partkey AS url FROM part)
         SELECT p_partkey, rid, ref_name, url
         FROM refs LEFT JOIN ups
           ON LOWER(REGEXP_REPLACE(ref_name, '\.[A-Za-z0-9]+$', ''))
            = LOWER(REGEXP_REPLACE(file_name, '\.[A-Za-z0-9]+$', ''))""",
    "q54_pad_rows" ->
      """WITH rows_t AS (
           SELECT l_orderkey, LIST_SORT(LIST(l_linenumber)) AS cells
           FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey),
         m AS (SELECT *, MAX(LEN(cells)) OVER () AS max_w FROM rows_t)
         SELECT l_orderkey,
           ARRAY_TO_STRING(
             LIST_CONCAT(LIST_TRANSFORM(cells, c -> CAST(c AS VARCHAR)),
               LIST_TRANSFORM(RANGE(1, max_w - LEN(cells) + 1), x -> '-')), '|') AS padded,
           CAST(max_w AS INTEGER) AS max_w
         FROM m""",
    "q55_union_regroup" ->
      """WITH u AS (
           SELECT o_custkey, o_orderkey, 'high_value' AS src FROM orders WHERE o_totalprice > 350000
           UNION ALL
           SELECT o_custkey, o_orderkey, 'urgent' FROM orders WHERE o_orderpriority = '1-URGENT'),
         per_order AS (
           SELECT o_custkey, o_orderkey,
             STRING_AGG(src, '+' ORDER BY src) AS srcs
           FROM u GROUP BY o_custkey, o_orderkey)
         SELECT o_custkey,
           STRING_AGG(o_orderkey || '=' || srcs, ';' ORDER BY o_orderkey, srcs) AS merged,
           COUNT(*) AS n_orders
         FROM per_order GROUP BY o_custkey""")
}
