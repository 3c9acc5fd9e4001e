package graft.transform

/** Form-config dimension extraction — the engine's implementation of the
  * reference's config-driven label mapping (transform_survey_data.py:5-66
  * reads `data/formConfig.ts`). Parses the TS source's field objects into
  * plain dimension rows:
  *
  *   options(fieldKey, code, label)   — radio/select/checkbox fields
  *   matrixRows(fieldKey, code, label) / matrixCols(fieldKey, code, label)
  *
  * Values may be quoted strings or bare numbers; numbers are normalized to
  * their string form (matrix answers arrive as JSON numbers).
  */
object FormConfig {

  case class Dim(fieldKey: String, code: String, label: String)
  case class Parsed(options: Seq[Dim], matrixRows: Seq[Dim], matrixCols: Seq[Dim])

  private val KeyRe = """(?m)^\s*key:\s*'([^']+)'""".r
  private val PairRe = """\{\s*label:\s*'([^']*)'\s*,\s*value:\s*(?:'([^']*)'|([-\d.]+))\s*\}""".r

  def parse(text: String): Parsed = {
    val keyMatches = KeyRe.findAllMatchIn(text).toVector
    val options = Vector.newBuilder[Dim]
    val mRows = Vector.newBuilder[Dim]
    val mCols = Vector.newBuilder[Dim]

    keyMatches.zipWithIndex.foreach { case (m, i) =>
      val fieldKey = m.group(1)
      val segEnd = if (i + 1 < keyMatches.length) keyMatches(i + 1).start else text.length
      val segment = text.substring(m.end, segEnd)
      extractList(segment, "options").foreach(d => options += d.copy(fieldKey = fieldKey))
      extractList(segment, "rows").foreach(d => mRows += d.copy(fieldKey = fieldKey))
      extractList(segment, "columns").foreach(d => mCols += d.copy(fieldKey = fieldKey))
    }
    Parsed(options.result(), mRows.result(), mCols.result())
  }

  /** Extract `<name>: [ {label, value}, ... ]` pairs from a field segment,
    * bracket-matched so sibling lists don't bleed into each other.
    */
  private def extractList(segment: String, name: String): Seq[Dim] = {
    val open = segment.indexOf(s"$name: [")
    if (open < 0) return Seq.empty
    var depth = 0
    var i = segment.indexOf('[', open)
    val start = i
    while (i < segment.length) {
      segment.charAt(i) match {
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) {
            val body = segment.substring(start, i + 1)
            return PairRe.findAllMatchIn(body).map { pm =>
              val value = Option(pm.group(2)).getOrElse(normalizeNumber(pm.group(3)))
              Dim("", value, pm.group(1))
            }.toSeq
          }
        case _ =>
      }
      i += 1
    }
    Seq.empty
  }

  /** `3` and `3.0` both answer as "3" in JSON-coerced matrix maps. */
  private def normalizeNumber(s: String): String =
    if (s.contains('.') && s.toDouble == s.toDouble.floor)
      s.toDouble.toLong.toString
    else s
}
