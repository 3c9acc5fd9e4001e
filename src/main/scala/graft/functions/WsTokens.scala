package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization as ONE compiled byte scan — the kernel behind
  * [[TextFunctions.tokens]], the single hottest expression in the engine
  * (every BM25/QLM pass, the Gopher rule family, the hashed classifier,
  * BLEU, textrank… all tokenize documents, several of them more than once
  * per row).
  *
  * Semantics are EXACTLY the composable form it replaces —
  * `filter(split(trim(text), "\\s+"), x => x =!= "")`:
  * maximal runs of non-`\s` bytes, in order; empty tokens (leading /
  * trailing / repeated separators) never appear; NULL in → NULL out.
  * Java-regex `\s` is ASCII-only ([ \t\n\x0B\f\r]) — NOT
  * Character.isWhitespace — and the DuckDB oracle's `\s+` agrees, so
  * U+3000/U+00A0 etc. stay INSIDE tokens on both engines (the
  * [[ShingleHashes]] splitter documents the same contract). The scan is
  * byte-level: every `\s` byte is < 0x80 and UTF-8 continuation/lead
  * bytes are ≥ 0x80, so multi-byte code points can never match a
  * separator. Tokens are zero-copy slices of one backing byte array.
  *
  * The composable form paid java.util.regex (an NFA walk per char plus an
  * allocation per token plus the split-array + filter-array copies) and,
  * being a HOF stack, evaluated INTERPRETED. Declared element type keeps
  * `containsNull = true` to match `split`'s — downstream schema
  * nullability (and therefore every Verify schema hash) is unchanged.
  */
case class WsTokens(child: Expression)
    extends UnaryExpression with RefKernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "ws_tokens"

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // count tokens first: exact-sized output array, no buffer growth
    var m = 0
    var i = 0
    while (i < n) {
      if (!WsTokens.isWs(bytes(i)) && (i == 0 || WsTokens.isWs(bytes(i - 1))))
        m += 1
      i += 1
    }
    val out = new Array[Any](m)
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && WsTokens.isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !WsTokens.isWs(bytes(i))) i += 1
      if (i > start) {
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      }
    }
    new GenericArrayData(out)
  }
}

object WsTokens {
  /** Java-regex `\s`: [ \t\n\x0B\f\r] — 0x09..0x0D plus 0x20. */
  @inline private[functions] def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
}
