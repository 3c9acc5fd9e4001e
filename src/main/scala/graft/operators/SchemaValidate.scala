package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-as-contract validation (SURVEY §1.3/§5: the reference pins its
  * survey payloads to `survey_schema.json`, a JSON-Schema draft-07
  * document — `dify_workflow_design.md` treats conformance as the gate
  * into the knowledge base). This operator compiles a draft-07 SUBSET
  * (`type`, `properties`, `required`, `enum`, `items`, `maxItems` —
  * everything the reference's schema uses) into a single Spark VARIANT
  * expression producing an in-band `violations` column: an
  * alphabetically-sorted array of `kind:dotted.path` strings (`missing:`,
  * `type:`, `enum:`, `maxItems:`, `items:`). Invalid rows are DATA, not
  * exceptions — the caller filters/quarantines/aggregates on the column,
  * so one pass validates 100 TB with zero driver involvement: the schema
  * is compiled driver-side ONCE (it is a bounded contract file) and the
  * resulting expression is pure per-row columnar work, no UDFs.
  *
  * Semantics notes (both engines verified against probes):
  * - A key that is ABSENT and a key that is JSON `null` are different:
  *   absent fails `required`, while `null` passes `required` but fails
  *   any `type` check (draft-07 has no nullable here).
  * - `enum` violations only fire on values that already pass the string
  *   type check — a wrongly-typed value reports `type:`, not both.
  * - `integer` means a whole-number JSON literal; engines disagree on
  *   `2.0` (Spark variant reads DECIMAL, DuckDB DOUBLE), so the contract
  *   is: write integers without a decimal point.
  *
  * The DuckDB rendering ([[violationsListSql]]) is generated from the
  * SAME compiled model, so the oracle twin can never drift from the
  * Spark semantics by hand-editing.
  */
object SchemaValidate {

  /** The draft-07 subset, parsed driver-side. `properties` preserves
    * declaration order (violation labels are path-sorted later, but
    * deterministic compile order keeps plans stable).
    */
  case class Node(
      typ: Option[String],
      required: Seq[String],
      enumVals: Seq[String],
      maxItems: Option[Int],
      properties: Seq[(String, Node)],
      items: Option[Node],
      // the rest of the common draft-07 validation vocabulary; the
      // reference schema doesn't use these, but a schema-as-contract
      // operator that silently ignored them would be a trap. pattern is
      // UNANCHORED (draft-07 partial match) and must stay in the
      // RE2∩Java regex subset (the repo's standing oracle rule);
      // min/maxLength count code points (BMP-identical both engines);
      // minimum/maximum are inclusive.
      pattern: Option[String] = None,
      minItems: Option[Int] = None,
      minimum: Option[Double] = None,
      maximum: Option[Double] = None,
      minLength: Option[Int] = None,
      maxLength: Option[Int] = None) {
    /** Properties plus required-only names (draft-07: `required` is
      * independent of `properties` — a required name with no property
      * schema still demands presence; without the synthesis the walkers
      * would generate NO check for it).
      */
    def childSeq: Seq[(String, Node)] = {
      val propNames = properties.map(_._1).toSet
      properties ++ required.filterNot(propNames.contains)
        .map(_ -> Node(None, Nil, Nil, None, Nil, None))
    }
  }

  /** Validation keywords this subset enforces + draft-07 annotation
    * keys that carry no validation semantics. Anything else REJECTS at
    * parse time: a schema keyword that parses but never enforces would
    * silently admit violating rows through the quarantine gate (e.g.
    * `exclusiveMinimum` treated as a no-op) — the same fail-fast rule
    * typeOkFrom applies to unknown type values.
    */
  private val SupportedKeys = Set(
    "type", "properties", "required", "enum", "items", "maxItems",
    "pattern", "minItems", "minimum", "maximum", "minLength", "maxLength")
  private val AnnotationKeys = Set(
    "$schema", "$id", "title", "description", "default", "examples")

  def parseSchema(json: String): Node = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    def walk(n: JsonNode): Node = {
      val unknown = n.fieldNames.asScala.toSeq
        .filterNot(k => SupportedKeys.contains(k) || AnnotationKeys.contains(k))
      require(unknown.isEmpty,
        s"unsupported schema keyword(s) ${unknown.mkString(", ")} — " +
          "refusing to compile a validator that silently ignores them")
      walkChecked(n)
    }
    def walkChecked(n: JsonNode): Node = Node(
      typ = Option(n.get("type")).map(_.asText),
      required = Option(n.get("required"))
        .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil),
      enumVals = Option(n.get("enum"))
        .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Nil),
      maxItems = Option(n.get("maxItems")).map(_.asInt),
      pattern = Option(n.get("pattern")).map(_.asText),
      minItems = Option(n.get("minItems")).map(_.asInt),
      minimum = Option(n.get("minimum")).map(_.asDouble),
      maximum = Option(n.get("maximum")).map(_.asDouble),
      minLength = Option(n.get("minLength")).map(_.asInt),
      maxLength = Option(n.get("maxLength")).map(_.asInt),
      // fields() (not properties(), which is an unordered Set): the
      // underlying ObjectNode iterates in declaration order, which keeps
      // compile order — and therefore plans and generated SQL — stable
      properties = Option(n.get("properties"))
        .map(_.fields.asScala.map(e => e.getKey -> walk(e.getValue)).toSeq)
        .getOrElse(Nil),
      items = Option(n.get("items")).map(walk))
    walk(new ObjectMapper().readTree(json))
  }

  /** The committed copy of the reference's `survey_schema.json` (the
    * data contract itself — parity content like the CHINA_REGIONS table;
    * SchemaValidateSpec pins it byte-identical to the reference file).
    */
  lazy val surveySchema: Node = {
    val in = getClass.getResourceAsStream("/graft/survey_schema.json")
    require(in != null, "bundled survey_schema.json missing")
    try parseSchema(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  // ---- Spark compilation ----------------------------------------------------

  /** Type predicate over an ALREADY-COMPUTED schema_of_variant string —
    * every multi-check site binds the string once ([[bind1]]) and feeds
    * it here; schema_of_variant walks the whole variant subtree, so
    * recomputing it per check measured ~2× on the full contract.
    */
  private def typeOkFrom(sch: Column, typ: String): Column = typ match {
    case "string"  => sch === "STRING"
    case "boolean" => sch === "BOOLEAN"
    case "integer" => sch === "BIGINT"
    case "number"  =>
      sch === "BIGINT" || sch.startsWith("DECIMAL") || sch === "DOUBLE"
    case "object"  => sch.startsWith("OBJECT")
    case "array"   => sch.startsWith("ARRAY")
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  private def typeOk(nv: Column, typ: String): Column =
    typeOkFrom(schema_of_variant(nv), typ)

  /** Recursive per-element check for `items` subschemas: true when the
    * element violates the item contract (wrong type, enum breach, or —
    * for object items — a missing/mistyped property, recursively).
    */
  private def elemBad(e: Column, node: Node): Column =
    bind1(schema_of_variant(e)) { esch =>
      val typBad = node.typ.map(t => !typeOkFrom(esch, t))
      val enumBad =
        if (node.enumVals.nonEmpty)
          Some(typeOkFrom(esch, "string") &&
            !try_variant_get(e, "$", "string").isin(node.enumVals: _*))
        else None
      // self-level value constraints on the element itself
      val selfVal = valueBad(e, esch, node)
      val propBad = node.childSeq.map { case (name, child) =>
        // bind cv + its schema string once per property, same discipline
        // as subtree — plain Columns re-expand per check
        bind1(variant_get(e, s"$$.$name", "variant")) { cv =>
          bind1(schema_of_variant(cv)) { sch =>
            // draft-07: `required` only constrains OBJECT instances —
            // a scalar element is not obligated to carry properties
            val miss =
              if (node.required.contains(name))
                Some(typeOkFrom(esch, "object") && cv.isNull)
              else None
            val tb = child.typ.map(t => cv.isNotNull && !typeOkFrom(sch, t))
            val eb =
              if (child.enumVals.nonEmpty)
                Some(cv.isNotNull && typeOkFrom(sch, "string") &&
                  !try_variant_get(cv, "$", "string").isin(child.enumVals: _*))
              else None
            val arr = try_variant_get(cv, "$", "array<variant>")
            val ib = child.items.map { itemNode =>
              cv.isNotNull && typeOkFrom(sch, "array") &&
                exists(arr, x => elemBad(x, itemNode))
            }
            val vb = Some(cv.isNotNull && valueBad(cv, sch, child))
            (miss ++ tb ++ eb ++ vb ++ ib)
              .reduceOption(_ || _).getOrElse(lit(false))
          }
        }
      }
      (typBad ++ enumBad ++ Seq(selfVal) ++ propBad)
        .reduceOption(_ || _).getOrElse(lit(false))
    }

  /** Non-recursive value constraints of a node against a bound variant
    * and its bound schema string (array sizes, pattern, length and
    * numeric bounds) — the boolean form shared by element positions;
    * property positions emit the same conditions with per-keyword labels.
    */
  private def valueBad(cv: Column, sch: Column, node: Node): Column = {
    val arr = try_variant_get(cv, "$", "array<variant>")
    val str = try_variant_get(cv, "$", "string")
    val num = try_variant_get(cv, "$", "double")
    val cs = Seq(
      node.maxItems.map(k => typeOkFrom(sch, "array") && size(arr) > k),
      node.minItems.map(k => typeOkFrom(sch, "array") && size(arr) < k),
      node.pattern.map(p => typeOkFrom(sch, "string") && !str.rlike(p)),
      node.minLength.map(k => typeOkFrom(sch, "string") && length(str) < k),
      node.maxLength.map(k => typeOkFrom(sch, "string") && length(str) > k),
      node.minimum.map(m => typeOkFrom(sch, "number") && num < m),
      node.maximum.map(m => typeOkFrom(sch, "number") && num > m)).flatten
    cs.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Evaluate `c` ONCE and reference it through a lambda variable. The
    * checks sit inside CASE WHEN branches, which defeats Spark's
    * subexpression elimination (conditional branches are excluded) — a
    * ~70-check contract would otherwise re-run its shared sub-extraction
    * per check (measured 5.5× on the full survey schema: 67 → 12 µs/row
    * for the parse alone, and the per-subtree bindings below take the
    * remaining deep re-walks out too). A bound column also survives
    * CollapseProject, which re-inlines plain withColumn aliases into
    * every downstream reference.
    */
  private def bind1(c: Column)(f: Column => Column): Column =
    graft.functions.TextFunctions.bindOnce(c)(f)

  private val emptyViolations = array().cast("array<string>")

  /** Violations contributed by `node`'s property subtree, given `nv` =
    * this node's variant bound via [[bind1]]. Every child variant is
    * extracted ONE level deep, exactly once, and recursion re-binds it —
    * no absolute-path re-walking from the root per check. Entries may be
    * null (check passed); the caller filters.
    */
  /** `node`'s property subtree given BOTH the bound variant and its
    * bound schema string — schema_of_variant walks its whole subtree,
    * and recomputing it per check measured ~2× on the full contract;
    * the recursion hands each child's already-bound string down, so
    * every variant and every schema string is computed exactly once
    * per row, at every depth.
    */
  private def subtreeFrom(
      nv: Column, nsch: Column, node: Node, dp: String): Column = {
      val isObj = typeOkFrom(nsch, "object")
      val perChild = node.childSeq.map { case (name, child) =>
        val cDp = if (dp.isEmpty) name else s"$dp.$name"
        bind1(variant_get(nv, s"$$.$name", "variant")) { cv =>
          bind1(schema_of_variant(cv)) { sch =>
            val missing =
              if (node.required.contains(name))
                Seq(when(isObj && cv.isNull, lit(s"missing:$cDp")))
              else Nil
            val typeBad = child.typ.map(t =>
              when(cv.isNotNull && !typeOkFrom(sch, t), lit(s"type:$cDp"))).toSeq
            val enumBad =
              if (child.enumVals.nonEmpty)
                Seq(when(cv.isNotNull && typeOkFrom(sch, "string") &&
                  !try_variant_get(cv, "$", "string").isin(child.enumVals: _*),
                  lit(s"enum:$cDp")))
              else Nil
            val arr = try_variant_get(cv, "$", "array<variant>")
            val maxBad = child.maxItems.map(k =>
              when(cv.isNotNull && typeOkFrom(sch, "array") && size(arr) > k,
                lit(s"maxItems:$cDp"))).toSeq
            val minBad = child.minItems.map(k =>
              when(cv.isNotNull && typeOkFrom(sch, "array") && size(arr) < k,
                lit(s"minItems:$cDp"))).toSeq
            val str = try_variant_get(cv, "$", "string")
            val patBad = child.pattern.map(p =>
              when(cv.isNotNull && typeOkFrom(sch, "string") && !str.rlike(p),
                lit(s"pattern:$cDp"))).toSeq
            val lenLow = child.minLength.map(k =>
              when(cv.isNotNull && typeOkFrom(sch, "string") && length(str) < k,
                lit(s"minLength:$cDp"))).toSeq
            val lenHigh = child.maxLength.map(k =>
              when(cv.isNotNull && typeOkFrom(sch, "string") && length(str) > k,
                lit(s"maxLength:$cDp"))).toSeq
            val num = try_variant_get(cv, "$", "double")
            val numLow = child.minimum.map(m =>
              when(cv.isNotNull && typeOkFrom(sch, "number") && num < m,
                lit(s"minimum:$cDp"))).toSeq
            val numHigh = child.maximum.map(m =>
              when(cv.isNotNull && typeOkFrom(sch, "number") && num > m,
                lit(s"maximum:$cDp"))).toSeq
            val itemsBad = child.items.map(itemNode =>
              when(cv.isNotNull && typeOkFrom(sch, "array") &&
                exists(arr, e => elemBad(e, itemNode)), lit(s"items:$cDp"))).toSeq
            val own = missing ++ typeBad ++ enumBad ++ maxBad ++ minBad ++
              patBad ++ lenLow ++ lenHigh ++ numLow ++ numHigh ++ itemsBad
            val ownArr = if (own.isEmpty) emptyViolations else array(own: _*)
            val rec =
              if (child.properties.nonEmpty)
                when(cv.isNotNull, subtreeFrom(cv, sch, child, cDp))
                  .otherwise(emptyViolations)
              else emptyViolations
            concat(ownArr, rec)
          }
        }
      }
      perChild.reduceOption(concat(_, _)).getOrElse(emptyViolations)
    }

  /** Sorted violation array for a VARIANT column against a schema.
    * Includes the ROOT type check (`type:$` for e.g. a JSON array or
    * null where the schema demands an object) — without it every
    * property check is gated off by the parent-is-object guard and a
    * non-object payload would validate clean. The root's schema string
    * is bound once and shared with the subtree walk.
    */
  def violationsArray(v: Column, schema: Node): Column =
    bind1(schema_of_variant(v)) { sch =>
      val rootChecks = schema.typ.map(t =>
        when(v.isNotNull && !typeOkFrom(sch, t), lit("type:$"))).toSeq
      val rootArr =
        if (rootChecks.isEmpty) emptyViolations else array(rootChecks: _*)
      array_sort(filter(concat(rootArr, subtreeFrom(v, sch, schema, "")),
        x => x.isNotNull))
    }

  /** Validate a JSON-string column: original columns + the in-band
    * violation array + `is_valid`. Malformed (or SQL-null) payloads are
    * DATA too — they come back as `violations = [malformed:$]`, never as
    * a job failure (try_parse_json; a strict parse would kill a 100 TB
    * quarantine scan on its first garbled row, the exact case this
    * operator exists for). The parsed variant is [[bind1]]-bound, so the
    * parse runs exactly once per row no matter how many checks the
    * schema compiles to.
    */
  def validate(
      df: DataFrame, jsonCol: Column, schema: Node,
      out: String = "violations"): DataFrame = {
    require(!df.columns.contains(out) && !df.columns.contains("is_valid"),
      s"input must not already carry $out/is_valid")
    df.withColumn(out, bind1(try_parse_json(jsonCol)) { v =>
        when(v.isNull, array(lit("malformed:$")))
          .otherwise(violationsArray(v, schema))
      })
      .withColumn("is_valid", size(col(out)) === 0)
  }

  // ---- DuckDB rendering (oracle twin, generated from the same model) --------

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private def typeOkSql(jt: String, typ: String): String = typ match {
    case "string"  => s"$jt = 'VARCHAR'"
    case "boolean" => s"$jt = 'BOOLEAN'"
    case "integer" => s"$jt IN ('BIGINT','UBIGINT')"
    case "number"  => s"$jt IN ('BIGINT','UBIGINT','DOUBLE')"
    case "object"  => s"$jt = 'OBJECT'"
    case "array"   => s"$jt = 'ARRAY'"
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** Element-level predicate over a JSON value `x` (see [[elemBad]]). */
  private def elemBadSql(x: String, node: Node, depth: Int): String = {
    val typBad = node.typ.map(t => s"NOT (${typeOkSql(s"json_type($x)", t)})")
    val enumBad =
      if (node.enumVals.nonEmpty)
        Some(s"(json_type($x) = 'VARCHAR' AND json_extract_string($x, '$$') " +
          s"NOT IN (${node.enumVals.map(sq).mkString(", ")}))")
      else None
    val selfVal = valueBadSql(x, None, node)
    val propBad = node.childSeq.flatMap { case (name, child) =>
      val jt = s"json_type($x, '$$.$name')"
      // required gated on the element being an OBJECT (draft-07; mirrors
      // elemBad — scalar elements are not obligated to carry properties)
      val miss =
        if (node.required.contains(name))
          Some(s"(json_type($x) = 'OBJECT' AND $jt IS NULL)")
        else None
      val tb = child.typ.map(t =>
        s"($jt IS NOT NULL AND NOT (${typeOkSql(jt, t)}))")
      val eb =
        if (child.enumVals.nonEmpty)
          Some(s"($jt = 'VARCHAR' AND json_extract_string($x, '$$.$name') " +
            s"NOT IN (${child.enumVals.map(sq).mkString(", ")}))")
        else None
      val vb = valueBadSql(x, Some(s"$$.$name"), child)
      val ib = child.items.map { itemNode =>
        val y = s"y$depth"
        s"($jt = 'ARRAY' AND len(list_filter(" +
          s"CAST($x->'$$.$name' AS JSON[]), " +
          s"$y -> ${elemBadSql(y, itemNode, depth + 1)})) > 0)"
      }
      miss ++ tb ++ eb ++ vb ++ ib
    }
    val all = (typBad ++ enumBad ++ selfVal ++ propBad).toSeq
    if (all.isEmpty) "FALSE" else all.mkString("(", " OR ", ")")
  }

  /** SQL twin of [[valueBad]] — one condition per present keyword,
    * empty when the node has none. `path` None = constraints on `x`
    * itself (element positions).
    */
  private def valueBadSql(
      x: String, path: Option[String], node: Node): Seq[String] = {
    val jt = path.map(p => s"json_type($x, '$p')").getOrElse(s"json_type($x)")
    val jes = path.map(p => s"json_extract_string($x, '$p')")
      .getOrElse(s"json_extract_string($x, '$$')")
    val jal = path.map(p => s"json_array_length($x, '$p')")
      .getOrElse(s"json_array_length($x)")
    Seq(
      node.maxItems.map(k => s"($jt = 'ARRAY' AND $jal > $k)"),
      node.minItems.map(k => s"($jt = 'ARRAY' AND $jal < $k)"),
      node.pattern.map(p =>
        s"($jt = 'VARCHAR' AND NOT regexp_matches($jes, ${sq(p)}))"),
      node.minLength.map(k => s"($jt = 'VARCHAR' AND length($jes) < $k)"),
      node.maxLength.map(k => s"($jt = 'VARCHAR' AND length($jes) > $k)"),
      node.minimum.map(m =>
        s"(${typeOkSql(jt, "number")} AND CAST($jes AS DOUBLE) < $m)"),
      node.maximum.map(m =>
        s"(${typeOkSql(jt, "number")} AND CAST($jes AS DOUBLE) > $m)")).flatten
  }

  private def compileSql(
      j: String, node: Node, path: String, dp: String): Seq[(String, String)] =
    node.childSeq.flatMap { case (name, child) =>
      val cPath = s"$path.$name"
      val cDp = if (dp.isEmpty) name else s"$dp.$name"
      val jt = s"json_type($j, '$cPath')"
      val parentIsObject =
        if (path == "$") s"json_type($j) = 'OBJECT'"
        else s"json_type($j, '$path') = 'OBJECT'"
      val missing =
        if (node.required.contains(name))
          Seq((s"($parentIsObject AND $jt IS NULL)", s"missing:$cDp"))
        else Nil
      val typeBad = child.typ.map(t =>
        (s"($jt IS NOT NULL AND NOT (${typeOkSql(jt, t)}))", s"type:$cDp")).toSeq
      val enumBad =
        if (child.enumVals.nonEmpty)
          Seq((s"($jt = 'VARCHAR' AND json_extract_string($j, '$cPath') " +
            s"NOT IN (${child.enumVals.map(sq).mkString(", ")}))",
            s"enum:$cDp"))
        else Nil
      val jes = s"json_extract_string($j, '$cPath')"
      val jal = s"json_array_length($j, '$cPath')"
      val valueBads: Seq[(String, String)] = Seq(
        child.maxItems.map(k =>
          (s"($jt = 'ARRAY' AND $jal > $k)", s"maxItems:$cDp")),
        child.minItems.map(k =>
          (s"($jt = 'ARRAY' AND $jal < $k)", s"minItems:$cDp")),
        child.pattern.map(p =>
          (s"($jt = 'VARCHAR' AND NOT regexp_matches($jes, ${sq(p)}))",
            s"pattern:$cDp")),
        child.minLength.map(k =>
          (s"($jt = 'VARCHAR' AND length($jes) < $k)", s"minLength:$cDp")),
        child.maxLength.map(k =>
          (s"($jt = 'VARCHAR' AND length($jes) > $k)", s"maxLength:$cDp")),
        child.minimum.map(m =>
          (s"(${typeOkSql(jt, "number")} AND CAST($jes AS DOUBLE) < $m)",
            s"minimum:$cDp")),
        child.maximum.map(m =>
          (s"(${typeOkSql(jt, "number")} AND CAST($jes AS DOUBLE) > $m)",
            s"maximum:$cDp"))).flatten
      val itemsBad = child.items.map(itemNode =>
        (s"($jt = 'ARRAY' AND len(list_filter(" +
          s"CAST($j->'$cPath' AS JSON[]), " +
          s"x0 -> ${elemBadSql("x0", itemNode, 1)})) > 0)",
          s"items:$cDp")).toSeq
      missing ++ typeBad ++ enumBad ++ valueBads ++ itemsBad ++
        compileSql(j, child, cPath, cDp)
    }

  /** DuckDB expression: the same sorted violation list over a JSON
    * expression `j` (e.g. a column already CAST to JSON).
    */
  def violationsListSql(j: String, schema: Node): String = {
    val rootCheck = schema.typ.map(t =>
      (s"(json_type($j) IS NOT NULL AND NOT (${typeOkSql(s"json_type($j)", t)}))",
        "type:$")).toSeq
    val checks = rootCheck ++ compileSql(j, schema, "$", "")
    if (checks.isEmpty) "CAST([] AS VARCHAR[])"
    else checks
      .map { case (c, l) => s"CASE WHEN $c THEN ${sq(l)} END" }
      .mkString("list_sort(list_filter([", ", ", "], v -> v IS NOT NULL))")
  }
}
