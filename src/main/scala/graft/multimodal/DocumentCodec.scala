package graft.multimodal

import java.io.ByteArrayInputStream
import java.util.zip.{Inflater, ZipInputStream}

/** Pure-JVM document text extraction — the REAL codec behind the S5 seam
  * (reference: the document parse stage of 多数据源获取数据.py:914-977 runs
  * python-docx/pdf libs; this container has neither, so the engine ships
  * its own minimal decoders instead of a stub):
  *
  *  - DOCX: zip + WordprocessingML — concatenates `<w:t>` runs, breaks
  *    paragraphs on `</w:p>`, line-breaks on `<w:br/>`/`<w:tab/>`.
  *  - PDF: object-stream scan — inflates `/FlateDecode` content streams,
  *    then evaluates the text-showing operators (`Tj`, `'`, `TJ` arrays)
  *    with PDF string escapes; `Td/TD/T*` and `ET` emit line breaks.
  *    Handles simple unencrypted PDFs with standard one-byte encodings —
  *    the common machine-generated report shape; exotic CMaps/encryption
  *    surface as None (the gate, not silent garbage).
  *
  * Both run per-row inside `Multimodal.parseDocuments`' mapPartitions batch,
  * so at scale extraction is embarrassingly parallel over the binaryFile
  * source with zero driver involvement.
  */
object DocumentCodec {

  sealed trait Format { def name: String }
  case object Docx extends Format { val name = "docx" }
  case object Pdf extends Format { val name = "pdf" }
  case object Unknown extends Format { val name = "unknown" }

  /** Magic-number dispatch: PK zip holding word/document.xml → docx;
    * %PDF- header → pdf.
    */
  def detectFormat(bytes: Array[Byte]): Format = {
    if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-') return Pdf
    if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4) {
      val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        var e = zis.getNextEntry
        while (e != null) {
          if (e.getName == "word/document.xml") return Docx
          e = zis.getNextEntry
        }
      } catch { case _: Exception => () } finally zis.close()
    }
    Unknown
  }

  /** Dispatching extractor; None = unsupported/undecodable payload. */
  def extractText(bytes: Array[Byte]): Option[String] = detectFormat(bytes) match {
    case Docx => extractDocx(bytes)
    case Pdf => extractPdf(bytes)
    case Unknown => None
  }

  // ---- DOCX ---------------------------------------------------------------

  private val WtRe = "(?s)<w:t[^>]*>(.*?)</w:t>".r
  private val ParaSplitRe = "</w:p>"

  def extractDocx(bytes: Array[Byte]): Option[String] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (e.getName == "word/document.xml") {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = zis.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = zis.read(tmp) }
          val xml = buf.toString("UTF-8")
          val paras = xml.split(ParaSplitRe).toSeq.map { p =>
            // breaks/tabs live BETWEEN <w:t> runs — rewrite them as text
            // runs so the single <w:t> extraction pass picks them up
            val withBreaks = p
              .replaceAll("<w:br\\s*/>", "<w:t>&#10;</w:t>")
              .replaceAll("<w:tab\\s*/>", "<w:t>&#9;</w:t>")
            WtRe.findAllMatchIn(withBreaks)
              .map(m => graft.sources.Xlsx.unescape(m.group(1))).mkString
          }
          return Some(paras.filter(_.nonEmpty).mkString("\n"))
        }
        e = zis.getNextEntry
      }
      None
    } catch { case _: Exception => None } finally zis.close()
  }

  // ---- PDF ----------------------------------------------------------------

  def extractPdf(bytes: Array[Byte]): Option[String] = {
    try {
      val out = new StringBuilder
      var i = indexOf(bytes, "stream", 0)
      while (i >= 0) {
        val windowStart = math.max(0, i - 512)
        val window = new String(bytes, windowStart, i - windowStart, "ISO-8859-1")
        // scope the dict to THIS object: the bytes since the last REAL
        // object header ("N G obj", not any 'obj' substring — a dict value
        // like (project objectives) must not truncate the scope) — a flat
        // 512-byte look-back would bleed the previous object's dict (e.g.
        // its /Subtype /Image) into this stream's
        val objAt = {
          var last = -1
          val m = ObjHeaderRe.findAllMatchIn(window)
          while (m.hasNext) last = m.next().start
          last
        }
        val dict = if (objAt >= 0) window.substring(objAt) else window
        var dataStart = i + "stream".length
        if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
        val end = indexOf(bytes, "endstream", dataStart)
        if (end < 0) {
          i = -1
        } else {
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, end)
          // /Subtype /Image streams skip before inflation (cheap dict
          // check); every other stream must additionally LOOK like a text
          // content stream — contain a BT (begin-text) block — before the
          // operator scan runs. Fonts and embedded files carry no marker
          // in their own dict (those keys live in the REFERRING object),
          // so the BT gate is what actually keeps inflated sfnt/zip binary
          // from being scanned for '(' and injected as garbage "text".
          val content =
            if (ImageSubtypeRe.findFirstIn(dict).isDefined) None
            else if (dict.contains("/FlateDecode")) inflate(raw)
            else Some(raw)
          content.foreach { c =>
            val s = new String(c, "ISO-8859-1")
            if (BtRe.findFirstIn(s).isDefined) {
              val text = extractContentText(s)
              if (text.nonEmpty) {
                if (out.nonEmpty) out.append('\n')
                out.append(text)
              }
            }
          }
          i = indexOf(bytes, "stream", end + "endstream".length)
        }
      }
      if (out.isEmpty) None else Some(out.toString)
    } catch { case _: Exception => None }
  }

  private val ImageSubtypeRe = "/Subtype\\s*/Image".r
  private val ObjHeaderRe = "\\d+\\s+\\d+\\s+obj".r
  /** BT as its own token (not a substring of e.g. a font name). */
  private val BtRe = "(?:^|[\\s>])BT[\\s(<\\[/]".r

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes("ISO-8859-1")
    var i = math.max(0, from)
    val last = hay.length - nb.length
    while (i <= last) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  /** None on ANY stall or error — a truncated/corrupt stream must surface
    * as undecodable, never as silently partial text.
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (!inf.finished()) return None // stalled: needs input/dict
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None } finally inf.end()
  }

  /** Evaluate the text-showing subset of a content stream: `(s) Tj`,
    * `(s) '` / `a b (s) "`, `[(a) -120 (b)] TJ`; `Td`/`TD`/`T*`/`ET` emit
    * newlines. Parsed strings are BUFFERED until their show operator
    * consumes them (so `'`'s move-then-show order is preserved). PDF string
    * escapes (\\ \( \) \n \r \t \b \f, \ooo octal, and line-continuation
    * backslash) are decoded.
    */
  private[multimodal] def extractContentText(content: String): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    var lineOpen = false
    def newline(): Unit = if (lineOpen) { out.append('\n'); lineOpen = false }
    def show(): Unit = if (pending.nonEmpty) {
      out.append(pending)
      pending.setLength(0)
      lineOpen = true
    }
    var i = 0
    val n = content.length
    def opEndsAt(next: Int): Boolean =
      next >= n || !Character.isLetterOrDigit(content.charAt(next))
    while (i < n) {
      content.charAt(i) match {
        case '(' =>
          val (s, next) = parsePdfString(content, i)
          pending.append(s)
          i = next
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' =>
          // skip the WHOLE balanced << ... >> dictionary (BDC property
          // lists, inline-image dicts): hex strings inside it are dict
          // VALUES (/ActualText <FEFF...>), not shown text
          var depth = 1
          i += 2
          while (i + 1 < n && depth > 0) {
            if (content.charAt(i) == '<' && content.charAt(i + 1) == '<') { depth += 1; i += 2 }
            else if (content.charAt(i) == '>' && content.charAt(i + 1) == '>') { depth -= 1; i += 2 }
            else i += 1
          }
        case '<' =>
          // hex string <48656C6C6F>: pairs of hex digits, whitespace
          // ignored, odd final digit padded with 0 per spec
          val hex = new StringBuilder
          i += 1
          while (i < n && content.charAt(i) != '>') {
            val ch = content.charAt(i)
            if (Character.digit(ch, 16) >= 0) hex.append(ch)
            i += 1
          }
          i += 1 // closing '>'
          if (hex.length % 2 == 1) hex.append('0')
          var h = 0
          while (h < hex.length) {
            pending.append(Integer.parseInt(hex.substring(h, h + 2), 16).toChar)
            h += 2
          }
        case '%' => // comment to end of line
          while (i < n && content.charAt(i) != '\n') i += 1
        case 'T' if i + 1 < n =>
          content.charAt(i + 1) match {
            case 'j' | 'J' if opEndsAt(i + 2) => show()
            case 'd' | 'D' | '*' if opEndsAt(i + 2) => newline()
            case _ => ()
          }
          i += 2
        case 'E' if i + 1 < n && content.charAt(i + 1) == 'T' && opEndsAt(i + 2) =>
          newline()
          i += 2
        case '\'' | '"' =>
          newline() // move to the next line, THEN show the buffered string
          show()
          i += 1
        case _ => i += 1
      }
    }
    out.toString
  }

  /** Parse one `(...)`-delimited PDF string starting at `start`; returns
    * (decoded, indexAfterClosingParen). Nested parens balance per spec.
    */
  private[multimodal] def parsePdfString(content: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = content.length
    while (i < n && depth > 0) {
      content.charAt(i) match {
        case '\\' if i + 1 < n =>
          content.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case c if c >= '0' && c <= '7' =>
              var oct = 0
              var k = 0
              i += 1
              while (k < 3 && i < n && content.charAt(i) >= '0' && content.charAt(i) <= '7') {
                oct = oct * 8 + (content.charAt(i) - '0')
                i += 1; k += 1
              }
              sb.append(oct.toChar)
            case c => sb.append(c); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }
}
