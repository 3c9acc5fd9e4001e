package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import graft.operators.SchemaValidate
import graft.operators.SchemaValidate.Node
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial assurance for the schema validator: an INDEPENDENT
  * reference implementation (a plain Jackson-tree walker of the same
  * draft-07 subset, sharing no code with the variant compilation) is
  * run against 400 seeded-random survey documents — every divergence
  * between the compiled expression and the reference is a bug in one
  * of them. The generator deliberately mixes valid sections, wrong
  * types, JSON nulls, missing required fields, bad enums, oversized
  * arrays, junk elements and deep manager subtrees.
  */
class SchemaValidatePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val F = JsonNodeFactory.instance

  // ---- the reference validator (independent semantics mirror) -------------

  private def typeOkRef(v: JsonNode, typ: String): Boolean = typ match {
    case "string"  => v.isTextual
    case "boolean" => v.isBoolean
    case "integer" => v.isIntegralNumber
    case "number"  => v.isNumber
    case "object"  => v.isObject
    case "array"   => v.isArray
  }

  private def valueBadRef(v: JsonNode, n: Node): Boolean = {
    def cp(s: String): Int = s.codePointCount(0, s.length)
    n.maxItems.exists(k => v.isArray && v.size > k) ||
      n.minItems.exists(k => v.isArray && v.size < k) ||
      n.pattern.exists(p => v.isTextual &&
        !java.util.regex.Pattern.compile(p).matcher(v.asText).find()) ||
      n.minLength.exists(k => v.isTextual && cp(v.asText) < k) ||
      n.maxLength.exists(k => v.isTextual && cp(v.asText) > k) ||
      n.minimum.exists(m => v.isNumber && v.asDouble < m) ||
      n.maximum.exists(m => v.isNumber && v.asDouble > m)
  }

  private def elemBadRef(e: JsonNode, n: Node): Boolean = {
    val typBad = n.typ.exists(t => !typeOkRef(e, t))
    val enumBad = n.enumVals.nonEmpty && e.isTextual &&
      !n.enumVals.contains(e.asText)
    val selfVal = valueBadRef(e, n)
    val propBad = n.childSeq.exists { case (name, child) =>
      val cv = Option(e.get(name))
      val miss = n.required.contains(name) && e.isObject && cv.isEmpty
      val present = cv.isDefined
      miss ||
        (present && child.typ.exists(t => !typeOkRef(cv.get, t))) ||
        (present && child.enumVals.nonEmpty && cv.get.isTextual &&
          !child.enumVals.contains(cv.get.asText)) ||
        (present && valueBadRef(cv.get, child)) ||
        (present && child.items.isDefined && cv.get.isArray &&
          cv.get.elements.hasNext && {
            val it = cv.get.elements
            var bad = false
            while (it.hasNext && !bad) bad = elemBadRef(it.next(), child.items.get)
            bad
          })
    }
    typBad || enumBad || selfVal || propBad
  }

  private def refViolations(root: JsonNode, schema: Node): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    schema.typ.foreach(t => if (!typeOkRef(root, t)) out += "type:$")
    def walk(v: JsonNode, n: Node, dp: String): Unit =
      n.childSeq.foreach { case (name, child) =>
        val cDp = if (dp.isEmpty) name else s"$dp.$name"
        val cv = Option(v.get(name))
        if (n.required.contains(name) && v.isObject && cv.isEmpty)
          out += s"missing:$cDp"
        cv.foreach { c =>
          child.typ.foreach(t => if (!typeOkRef(c, t)) out += s"type:$cDp")
          if (child.enumVals.nonEmpty && c.isTextual &&
            !child.enumVals.contains(c.asText)) out += s"enum:$cDp"
          def cp(s: String): Int = s.codePointCount(0, s.length)
          child.maxItems.foreach(k =>
            if (c.isArray && c.size > k) out += s"maxItems:$cDp")
          child.minItems.foreach(k =>
            if (c.isArray && c.size < k) out += s"minItems:$cDp")
          child.pattern.foreach(p => if (c.isTextual &&
            !java.util.regex.Pattern.compile(p).matcher(c.asText).find())
            out += s"pattern:$cDp")
          child.minLength.foreach(k =>
            if (c.isTextual && cp(c.asText) < k) out += s"minLength:$cDp")
          child.maxLength.foreach(k =>
            if (c.isTextual && cp(c.asText) > k) out += s"maxLength:$cDp")
          child.minimum.foreach(m =>
            if (c.isNumber && c.asDouble < m) out += s"minimum:$cDp")
          child.maximum.foreach(m =>
            if (c.isNumber && c.asDouble > m) out += s"maximum:$cDp")
          child.items.foreach { itemNode =>
            if (c.isArray) {
              val it = c.elements
              var bad = false
              while (it.hasNext && !bad) bad = elemBadRef(it.next(), itemNode)
              if (bad) out += s"items:$cDp"
            }
          }
          walk(c, child, cDp)
        }
      }
    walk(root, schema, "")
    out.sorted.toSeq
  }

  // ---- the adversarial generator ------------------------------------------

  private def randomDoc(rnd: scala.util.Random): ObjectNode = {
    val root = F.objectNode()
    def randomScalar(): JsonNode = rnd.nextInt(6) match {
      case 0 => F.textNode("公办")
      case 1 => F.textNode(s"txt${rnd.nextInt(100)}")
      case 2 => F.numberNode(rnd.nextInt(2000) - 1000)
      case 3 => F.booleanNode(rnd.nextBoolean())
      case 4 => F.nullNode()
      case 5 => F.numberNode(rnd.nextInt(100) + 0.5)
    }
    if (rnd.nextInt(10) == 0) {
      // degenerate roots
      return root // empty object
    }
    if (rnd.nextBoolean()) {
      val inst = root.putObject("institution_info")
      Seq("name", "city", "subject_type", "specific_form").foreach { f =>
        if (rnd.nextInt(4) > 0) inst.set[JsonNode](f, randomScalar()): Unit
      }
      if (rnd.nextInt(4) > 0) inst.set[JsonNode]("is_puhui", randomScalar()): Unit
      if (rnd.nextInt(4) > 0) {
        val sm = inst.putArray("service_modes")
        (0 until rnd.nextInt(4)).foreach(_ => sm.add(randomScalar()): Unit)
      }
      Seq("total_capacity", "current_enrollment", "staff_count").foreach { f =>
        if (rnd.nextInt(4) > 0) inst.set[JsonNode](f, randomScalar()): Unit
      }
    }
    if (rnd.nextBoolean()) {
      val p = root.putObject("personal_info")
      Seq("gender", "education", "major").foreach { f =>
        if (rnd.nextInt(4) > 0) p.set[JsonNode](f, randomScalar()): Unit
      }
    }
    if (rnd.nextBoolean()) {
      val e = root.putObject("employment_info")
      Seq("current_position", "job_change_interval", "salary_range",
        "is_kindergarten_transition", "transition_needs").foreach { f =>
        if (rnd.nextInt(3) > 0) e.set[JsonNode](f, randomScalar()): Unit
      }
      if (rnd.nextInt(3) > 0) {
        val jr = e.putArray("job_change_reasons")
        (0 until rnd.nextInt(6)).foreach(_ => jr.add(randomScalar()): Unit)
      }
    }
    if (rnd.nextInt(3) == 0) {
      val m = root.putObject("manager_specific_info").putObject("recruitment_training")
      val sp = m.putArray("shortage_positions")
      (0 until rnd.nextInt(3)).foreach { _ =>
        if (rnd.nextInt(4) == 0) sp.add(randomScalar()): Unit
        else {
          val o = sp.addObject()
          if (rnd.nextBoolean()) o.set[JsonNode]("position", randomScalar()): Unit
          if (rnd.nextBoolean()) o.set[JsonNode]("count", randomScalar()): Unit
        }
      }
      val cr = m.putArray("certificate_requirements")
      (0 until rnd.nextInt(2)).foreach { _ =>
        val o = cr.addObject()
        o.put("position", "p")
        val certs = o.putArray("certificates")
        (0 until rnd.nextInt(3)).foreach(_ => certs.add(randomScalar()): Unit)
      }
    }
    root
  }

  test("compiled validator == independent Jackson reference on 400 random docs") {
    val rnd = new scala.util.Random(20260814L)
    val docsJson = (1 to 400).map { i =>
      val d = randomDoc(rnd)
      (i.toLong, d.toString, d: JsonNode)
    }
    val got = SchemaValidate.validate(
        docsJson.map(d => (d._1, d._2)).toDF("id", "j"), col("j"),
        SchemaValidate.surveySchema)
      .select("id", "violations").as[(Long, Seq[String])]
      .collect().toMap
    var checked = 0
    var withViol = 0
    docsJson.foreach { case (id, _, tree) =>
      val want = refViolations(tree, SchemaValidate.surveySchema)
      assert(got(id) == want,
        s"doc $id: got ${got(id)} want $want\n${tree.toString.take(400)}")
      checked += 1
      if (want.nonEmpty) withViol += 1
    }
    // the generator must exercise both classes heavily
    assert(checked == 400 && withViol > 100 && withViol < 400,
      s"degenerate generator: $withViol/400 with violations")
  }
}
