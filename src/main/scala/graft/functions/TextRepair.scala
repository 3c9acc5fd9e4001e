package graft.functions

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text form for dedup keying — the standard chain every
  * web-corpus dedup pipeline applies before hashing so that trivial
  * variants (case, accents, decomposed Unicode, whitespace runs) collapse
  * onto one key: NFC → strip accents (NFD, drop combining marks, NFC) →
  * lowercase → collapse whitespace → trim. One compiled pass per row
  * (RefKernelCodegen), oracle-mirrored by DuckDB's
  * `trim(regexp_replace(lower(strip_accents(nfc_normalize(s))), '\s+', ' ', 'g'))`
  * (q126). Reference analog: the clean_text normalization chain
  * (DATA:1164-1214) that precedes the reference's exact-id dedup.
  */
case class CanonicalText(child: Expression)
    extends UnaryExpression with RefKernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_text"

  override protected def withNewChildInternal(newChild: Expression): CanonicalText =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CanonicalText.canonicalize(input.asInstanceOf[UTF8String].toString))
}

object CanonicalText {

  def canonicalize(s: String): String = {
    // strip accents: decompose, drop combining marks, recompose. Composing
    // first is unnecessary — NFD of NFC(s) == NFD(s) by UAX #15.
    val nfd = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val stripped = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    stripped.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim
  }

  /** Column bridge for the compiled canonicalization pass. */
  def expr(spark: SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_canonical_text", exprs => CanonicalText(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_canonical_text", c)
  }
}

/** Mojibake repair (the ftfy core heuristic): text that went through a
  * UTF-8-bytes-read-as-CP1252 mis-decode ("é" → "Ã©") is detected and
  * reversed by round-tripping — re-encode the characters as CP1252 bytes
  * and strictly re-decode as UTF-8. The repair applies ONLY when the
  * round trip (a) encodes losslessly, (b) decodes as valid UTF-8 and
  * (c) changes the string; otherwise the input passes through untouched —
  * ASCII and correctly-decoded text are fixed points, so the pass is safe
  * to run corpus-wide. One compiled pass per row; the q128 oracle replays
  * the planted sequences with static replaces, certifying the GENERAL
  * algorithm on them. Reference analog: the encoding-sniff half of the
  * document parse chain (DATA:1384-1447).
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression with RefKernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fix_mojibake"

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      FixMojibake.repair(input.asInstanceOf[UTF8String].toString))
}

object FixMojibake {

  private val cp1252 = Charset.forName("windows-1252")

  def repair(s: String): String = {
    // fast path: pure-ASCII strings cannot be mojibake
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    try {
      val enc = cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes = enc.encode(java.nio.CharBuffer.wrap(s))
      val dec = Charset.forName("UTF-8").newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = dec.decode(bytes).toString
      if (out != s) out else s
    } catch {
      case _: CharacterCodingException => s
    }
  }

  /** Column bridge for the compiled repair pass. */
  def expr(spark: SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fix_mojibake", exprs => FixMojibake(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_fix_mojibake", c)
  }
}
