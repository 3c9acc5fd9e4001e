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
  case object Pptx extends Format { val name = "pptx" }
  /** OLE2 compound file (.doc/.ppt/.xls) — decoded for REAL by [[Ole2]]
    * (CFB reader + Word-97 piece table + PowerPoint-97 text atoms); the
    * reference routes these to MarkItDown (多数据源获取数据.py:1210-1214),
    * which this engine has no need of. The converter seam still applies
    * as the fallback when extraction yields nothing.
    */
  case object LegacyOffice extends Format { val name = "legacy-office" }
  case object Unknown extends Format { val name = "unknown" }

  /** Magic-number dispatch: PK zip holding word/document.xml → docx,
    * ppt/presentation.xml or a ppt/slides/ entry → pptx; %PDF- header →
    * pdf; OLE2 D0CF11E0 header → legacy office.
    */
  def detectFormat(bytes: Array[Byte]): Format = {
    if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-') return Pdf
    if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
      (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0 &&
      (bytes(4) & 0xFF) == 0xA1 && (bytes(5) & 0xFF) == 0xB1 &&
      (bytes(6) & 0xFF) == 0x1A && (bytes(7) & 0xFF) == 0xE1) return LegacyOffice
    if (bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4) {
      val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        var e = zis.getNextEntry
        while (e != null) {
          if (e.getName == "word/document.xml") return Docx
          if (e.getName == "ppt/presentation.xml" ||
            e.getName.startsWith("ppt/slides/slide")) return Pptx
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
    case Pptx => extractPptx(bytes)
    case LegacyOffice => Ole2.extractText(bytes)
    case Unknown => None
  }

  // ---- parse dispatch + fallback chain ------------------------------------

  /** External-converter seam (the reference's MarkItDown slot): given
    * (bytes, normalized extension), return converted markdown or None.
    */
  type FallbackConverter = (Array[Byte], String) => Option[String]
  val NoFallback: FallbackConverter = (_, _) => None

  /** The reference's parse entry point (多数据源获取数据.py:1181-1225):
    * extension-keyed dedicated parsers first; when the dedicated parse
    * yields nothing, fall back — magic-number sniffing (rescues misnamed
    * files, the role MarkItDown's own format detection plays), then the
    * external-converter seam, then the reference's literal
    * `[无法解析 <ext> 格式文件]` marker. Legacy .doc/.ppt decode for real
    * first (pure-JVM [[Ole2]] CFB walk); only when that yields nothing does
    * the chain reach the converter seam — the slot where the reference
    * routes them to MarkItDown.
    */
  def parse(bytes: Array[Byte], extension: String,
      fallback: FallbackConverter = NoFallback): String = {
    val ext = {
      val e = extension.toLowerCase.trim
      if (e.isEmpty || e.startsWith(".")) e else s".$e"
    }
    val dedicated: Option[String] = ext match {
      case ".pdf" => extractPdf(bytes)
      case ".docx" => extractDocx(bytes)
      case ".pptx" => extractPptx(bytes)
      // real legacy decode first (the reference has only MarkItDown here);
      // on empty the CHAIN below reaches the converter seam — no inner
      // orElse, or a side-effecting converter would fire twice
      case ".doc" | ".ppt" | ".xls" => Ole2.extractText(bytes)
      case ".txt" | ".md" | ".markdown" => decodePlainText(bytes)
      case _ => None
    }
    def nonBlank(o: Option[String]) = o.filter(_.trim.nonEmpty)
    nonBlank(dedicated)
      .orElse(nonBlank(extractText(bytes)))
      .orElse(nonBlank(fallback(bytes, ext)))
      .getOrElse(s"[无法解析 $ext 格式文件]")
  }

  /** String-level twin of `TextFunctions.decodeChain` (F14): first charset
    * whose strict decode round-trips the bytes wins; lossy latin-1 last.
    */
  private[multimodal] def decodePlainText(bytes: Array[Byte]): Option[String] = {
    if (bytes.isEmpty) return None
    Seq("UTF-8", "GBK").foreach { cs =>
      try {
        val dec = java.nio.charset.Charset.forName(cs).newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        val s = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        if (java.util.Arrays.equals(s.getBytes(cs), bytes)) return Some(s)
      } catch { case _: Exception => () }
    }
    Some(new String(bytes, "ISO-8859-1"))
  }

  // ---- DOCX ---------------------------------------------------------------

  // exact tag-name: `<w:t>`/`<w:t xml:space=…>` but never `<w:tbl>`
  private val WtRe = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>".r
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

  // ---- PPTX ---------------------------------------------------------------

  private val SlideEntryRe = "ppt/slides/slide(\\d+)\\.xml".r
  // `(?:\s[^>]*)?` keeps the tag-name match exact — `<a:t>` but never
  // `<a:txBody>`/`<a:tbl>`
  private val AtRe = "(?s)<a:t(?:\\s[^>]*)?>(.*?)</a:t>".r
  private val AOffYRe = "<a:off\\s[^>]*y=\"(-?\\d+)\"".r
  private val PhIdxRe = "idx=\"(\\d+)\"".r
  private val ShapeBlockRe =
    "(?s)<p:(sp|pic|graphicFrame)[\\s>].*?</p:\\1>".r
  private val AParaSplit = "</a:p>"
  private val TrRe = "(?s)<a:tr[\\s>](.*?)</a:tr>".r
  private val TcRe = "(?s)<a:tc[\\s>](.*?)</a:tc>".r

  /** PPTX slide-deck extraction (reference `_parse_pptx`,
    * 多数据源获取数据.py:841-911): slides in numeric order; within a slide
    * every shape is keyed by its `top` (EMU y-offset) and the shapes are
    * emitted TOP-ORDERED, not document-ordered — text frames as
    * paragraph-joined text, pictures as `![幻灯片N-图片M](__PPTX_IMG_M__)`
    * placeholders (the upload half is the reference's uploader seam),
    * tables as markdown. Slide header `## 幻灯片 N[: title]` where the
    * title is the idx-0 placeholder's text; slides joined by `---` rules.
    */
  def extractPptx(bytes: Array[Byte]): Option[String] = {
    val slides = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        e.getName match {
          case SlideEntryRe(num) =>
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            var n = zis.read(tmp)
            while (n >= 0) { buf.write(tmp, 0, n); n = zis.read(tmp) }
            slides += ((num.toInt, buf.toString("UTF-8")))
          case _ => ()
        }
        e = zis.getNextEntry
      }
    } catch { case _: Exception => return None } finally zis.close()
    if (slides.isEmpty) return None

    var imgCount = 0
    val parts = slides.sortBy(_._1).zipWithIndex.flatMap { case ((_, xml), si) =>
      // (top, text) elements; stable sort preserves document order on ties
      val elements = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      var slideTitle = ""
      ShapeBlockRe.findAllMatchIn(xml).foreach { m =>
        val block = m.matched
        val top = AOffYRe.findFirstMatchIn(block).map(_.group(1).toLong).getOrElse(0L)
        m.group(1) match {
          case "sp" =>
            val text = block.split(AParaSplit).iterator
              .map(p => AtRe.findAllMatchIn(p)
                .map(t => graft.sources.Xlsx.unescape(t.group(1))).mkString.trim)
              .filter(_.nonEmpty).mkString("\n")
            if (text.nonEmpty) {
              // placeholder idx defaults to 0 when absent — idx 0 is the
              // title placeholder (python-pptx placeholder_format.idx == 0)
              val phAt = block.indexOf("<p:ph")
              val isTitle = phAt >= 0 && {
                val tagEnd = block.indexOf('>', phAt)
                val tag = if (tagEnd > 0) block.substring(phAt, tagEnd) else ""
                PhIdxRe.findFirstMatchIn(tag).forall(_.group(1) == "0")
              }
              if (slideTitle.isEmpty && isTitle) slideTitle = text
              elements += ((top, text))
            }
          case "pic" =>
            imgCount += 1
            elements += ((top, s"![幻灯片${si + 1}-图片$imgCount](__PPTX_IMG_${imgCount}__)"))
          case "graphicFrame" =>
            val rows = TrRe.findAllMatchIn(block).map { tr =>
              TcRe.findAllMatchIn(tr.group(1)).map { tc =>
                AtRe.findAllMatchIn(tc.group(1))
                  .map(t => graft.sources.Xlsx.unescape(t.group(1))).mkString.trim
              }.toSeq
            }.toSeq
            if (rows.nonEmpty) elements += ((top, rowsToMdTable(rows)))
        }
      }
      val ordered = elements.sortBy(_._1) // stable (sortBy is a stable sort)
      val body = ordered.map(_._2).mkString("\n\n")
      if (body.trim.isEmpty) None
      else {
        val header = s"## 幻灯片 ${si + 1}" +
          (if (slideTitle.nonEmpty) s": $slideTitle" else "")
        Some(s"$header\n\n$body")
      }
    }
    if (parts.isEmpty) None else Some(parts.mkString("\n\n---\n\n"))
  }

  /** One text shape of a deck slide: EMU y-offset, text (newlines become
    * separate `<a:p>` paragraphs), and whether it is the idx-0 title
    * placeholder.
    */
  case class DeckShape(topEmu: Long, text: String, isTitle: Boolean = false)

  /** Render slides as a minimal ECMA-376 presentation package — the writer
    * half of the S5 PPTX surface and the fixture generator for the PPTX
    * round-trip oracle. Shapes are written in the given order with explicit
    * y-offsets, so a fixture can assert the reader's top-reordering. Output
    * parses back identically through [[extractPptx]].
    */
  def writeDeck(slides: Seq[Seq[DeckShape]]): Array[Byte] = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&apos;")
    def shapeXml(sh: DeckShape, id: Int): String = {
      val ph = if (sh.isTitle) """<p:ph type="title"/>""" else ""
      val paras = sh.text.split("\n", -1).map(p =>
        s"<a:p><a:r><a:t>${esc(p)}</a:t></a:r></a:p>").mkString
      s"""<p:sp><p:nvSpPr><p:cNvPr id="$id" name="Shape$id"/><p:cNvSpPr/>""" +
        s"""<p:nvPr>$ph</p:nvPr></p:nvSpPr>""" +
        s"""<p:spPr><a:xfrm><a:off x="0" y="${sh.topEmu}"/>""" +
        """<a:ext cx="914400" cy="914400"/></a:xfrm></p:spPr>""" +
        s"""<p:txBody><a:bodyPr/>$paras</p:txBody></p:sp>"""
    }
    def slideXml(shapes: Seq[DeckShape]): String =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" """ +
        """xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""" +
        """<p:cSld><p:spTree>""" +
        shapes.zipWithIndex.map { case (sh, i) => shapeXml(sh, i + 2) }.mkString +
        """</p:spTree></p:cSld></p:sld>"""
    val typesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>""" +
        slides.indices.map(i =>
          s"""<Override PartName="/ppt/slides/slide${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>""").mkString +
        """</Types>"""
    val presXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""" +
        """<p:sldIdLst>""" +
        slides.indices.map(i => s"""<p:sldId id="${256 + i}"/>""").mkString +
        """</p:sldIdLst></p:presentation>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml", typesXml)
    put("ppt/presentation.xml", presXml)
    slides.zipWithIndex.foreach { case (shapes, i) =>
      put(s"ppt/slides/slide${i + 1}.xml", slideXml(shapes))
    }
    zos.close()
    bos.toByteArray
  }

  /** Markdown table renderer (reference `_rows_to_md_table`,
    * 多数据源获取数据.py:1063-1073): rows padded to max width, `|` escaped,
    * newlines flattened, cells truncated to 80 chars, first row = header.
    */
  private[graft] def rowsToMdTable(rows: Seq[Seq[String]]): String = {
    if (rows.isEmpty) return ""
    val maxCols = rows.map(_.length).max
    val padded = rows.map(r => r ++ Seq.fill(maxCols - r.length)(""))
    def cell(c: String): String =
      c.replace("|", "\\|").replace("\n", " ").take(80)
    val header = padded.head.map(cell).mkString("| ", " | ", " |")
    val sep = Seq.fill(maxCols)("---").mkString("| ", " | ", " |")
    val body = padded.tail.map(_.map(cell).mkString("| ", " | ", " |"))
    (Seq(header, sep) ++ body).mkString("\n")
  }

  // ---- PDF ----------------------------------------------------------------

  /** One absolutely-positioned text element of a PDF page fixture. */
  case class PdfElem(x: Double, y: Double, text: String)

  /** Render pages as a minimal PDF — the writer half of the S5 PDF surface
    * and the fixture generator for the q153 layout round-trip: every
    * element is positioned with an explicit `Tm`, in the GIVEN order, so a
    * fixture can write blocks out of stream order / as side-by-side cells
    * and assert the reader's y-sorted block assembly and table extraction.
    * Output parses back through [[extractPdf]].
    */
  def writePdf(pages: Seq[Seq[PdfElem]], flate: Boolean = true): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    def num(d: Double): String =
      if (d == math.rint(d)) d.toLong.toString else d.toString
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    pages.zipWithIndex.foreach { case (elems, pi) =>
      val content = elems.map(e =>
        s"1 0 0 1 ${num(e.x)} ${num(e.y)} Tm (${esc(e.text)}) Tj")
        .mkString("BT /F1 12 Tf\n", "\n", "\nET")
      val data =
        if (flate) {
          val d = new java.util.zip.Deflater()
          d.setInput(content.getBytes("ISO-8859-1")); d.finish()
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          out.toByteArray
        } else content.getBytes("ISO-8859-1")
      val filter = if (flate) " /Filter /FlateDecode" else ""
      w(s"${pi + 4} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      bos.write(data)
      w("\nendstream\nendobj\n")
    }
    w("%%EOF\n")
    bos.toByteArray
  }

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

  /** One positioned text segment: the text shown by consecutive show ops
    * between two line-moves, at the text-space position of its line start.
    * `seq` is stream order — the tie-break that keeps degenerate streams
    * (no real positioning, e.g. every line at y = 0) in written order.
    */
  private[multimodal] case class PdfSeg(x: Double, y: Double, seq: Int, text: String)

  /** Evaluate the text-showing AND text-positioning subset of a content
    * stream: shows `(s) Tj`, `(s) '` / `aw ac (s) "`, `[(a) -120 (b)] TJ`;
    * positions `Tm` (e, f = line origin), `Td`/`TD` (line translate,
    * TD also sets leading), `TL` (leading), `T*` (next line by leading),
    * `BT` (matrix reset). Parsed strings are BUFFERED until their show
    * operator consumes them (so `'`'s move-then-show order is preserved).
    * PDF string escapes (\\ \( \) \n \r \t \b \f, \ooo octal, and
    * line-continuation backslash) are decoded.
    *
    * Scale note: this runs once per stream inside a mapPartitions decode —
    * driver never sees content bytes.
    */
  private[multimodal] def extractSegments(content: String): Seq[PdfSeg] = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[PdfSeg]
    val pending = new StringBuilder
    val open = new StringBuilder  // text of the currently open segment
    var lineX = 0.0
    var lineY = 0.0
    var leading = 0.0
    var segX = 0.0
    var segY = 0.0
    var segOpen = false
    // operand buffer: the numbers seen since the last operator/string
    val ops = scala.collection.mutable.ArrayBuffer.empty[Double]
    def closeSeg(): Unit = if (segOpen) {
      if (open.nonEmpty) segs += PdfSeg(segX, segY, segs.length, open.toString)
      open.setLength(0)
      segOpen = false
    }
    def show(): Unit = if (pending.nonEmpty) {
      if (!segOpen) { segX = lineX; segY = lineY; segOpen = true }
      open.append(pending)
      pending.setLength(0)
    }
    def moveLine(tx: Double, ty: Double): Unit = {
      closeSeg()
      lineX += tx
      lineY += ty
    }
    var i = 0
    val n = content.length
    while (i < n) {
      val c = content.charAt(i)
      c match {
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
          ops.clear()
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
        case '/' => // name token: skip so its chars aren't read as operators
          i += 1
          while (i < n && !isPdfDelim(content.charAt(i))) i += 1
        case d if d == '+' || d == '-' || d == '.' || (d >= '0' && d <= '9') =>
          val start = i
          i += 1
          while (i < n && {
            val ch = content.charAt(i)
            ch == '.' || (ch >= '0' && ch <= '9')
          }) i += 1
          try ops += content.substring(start, i).toDouble
          catch { case _: NumberFormatException => () }
        case a if Character.isLetter(a) || a == '\'' || a == '"' || a == '*' =>
          val start = i
          i += 1
          while (i < n && {
            val ch = content.charAt(i)
            Character.isLetterOrDigit(ch) || ch == '*' || ch == '\'' || ch == '"'
          }) i += 1
          content.substring(start, i) match {
            case "Tj" | "TJ" => show()
            case "Td" =>
              if (ops.length >= 2) moveLine(ops(ops.length - 2), ops.last)
              else closeSeg()
            case "TD" =>
              if (ops.length >= 2) {
                leading = -ops.last
                moveLine(ops(ops.length - 2), ops.last)
              } else closeSeg()
            case "T*" => moveLine(0, -leading)
            case "TL" => if (ops.nonEmpty) leading = ops.last
            case "Tm" =>
              closeSeg()
              if (ops.length >= 6) {
                lineX = ops(ops.length - 2)
                lineY = ops.last
              }
            case "BT" =>
              closeSeg()
              lineX = 0; lineY = 0
            case "ET" => closeSeg()
            case "'" =>
              moveLine(0, -leading) // move to the next line, THEN show
              show()
            case s if s.endsWith("\"") =>
              // aw ac (s) " — the two spacing operands are not positions
              moveLine(0, -leading)
              show()
            case _ => ()
          }
          ops.clear()
        case _ => i += 1
      }
    }
    closeSeg()
    segs.toSeq
  }

  private def isPdfDelim(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == '\u0000' ||
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Assemble positioned segments into page text the way the reference
    * orders PDFs (多数据源获取数据.py:667-762): bbox y-coordinate ordering
    * with markdown table extraction, rather than content-stream order.
    *
    *  - segments sharing a quantized y with pairwise-distinct x form one
    *    VISUAL LINE, cells ordered left-to-right (two side-by-side column
    *    blocks interleave in reading order, exactly like the reference's
    *    y-sort); same-(x, y) segments stay separate stream-ordered lines,
    *    which keeps metric-less streams (everything at the origin) in
    *    written order — the stable sort never reorders equal keys
    *  - lines sort top-down (PDF y grows upward); a vertical gap > 1.8×
    *    the median line pitch starts a new block (blank-line separated)
    *  - ≥2 consecutive lines of ≥2 cells with column-aligned x (±3 units)
    *    render as a markdown table via [[rowsToMdTable]] — the reference's
    *    `_rows_to_md_table` semantics, first row = header
    */
  private[multimodal] def assemblePage(segs: Seq[PdfSeg]): String = {
    if (segs.isEmpty) return ""
    case class VLine(y: Double, xs: Seq[Double], cells: Seq[String])
    val lines = scala.collection.mutable.ArrayBuffer.empty[(Int, VLine)]
    segs.groupBy(s => math.round(s.y * 2)).foreach { case (_, group) =>
      val distinctX = group.map(s => math.round(s.x * 2)).distinct.length == group.length
      if (distinctX && group.length > 1) {
        val sorted = group.sortBy(_.x)
        lines += ((group.map(_.seq).min,
          VLine(group.head.y, sorted.map(_.x), sorted.map(_.text))))
      } else {
        // no usable x separation: stream-ordered separate lines
        group.foreach(s => lines += ((s.seq, VLine(s.y, Seq(s.x), Seq(s.text)))))
      }
    }
    // stable top-down sort; stream order (seq) only breaks exact y ties
    val ordered = lines.sortBy { case (seq, l) => (-l.y, seq) }.map(_._2).toSeq
    // block grouping by vertical gap
    val gaps = ordered.sliding(2).collect {
      case Seq(a, b) if a.y - b.y > 0.25 => a.y - b.y
    }.toSeq.sorted
    // lower median: with few distinct pitches the smaller (intra-block
    // line pitch) must win, or a page with as many block gaps as line
    // gaps would never split
    val blockGap = if (gaps.isEmpty) Double.MaxValue
      else 1.8 * gaps((gaps.length - 1) / 2)
    val blocks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer(ordered.head))
    ordered.sliding(2).foreach {
      case Seq(a, b) =>
        if (a.y - b.y > blockGap) blocks += scala.collection.mutable.ArrayBuffer(b)
        else blocks.last += b
      case _ => ()
    }
    // render each block: consecutive aligned multi-cell lines become tables
    def aligned(a: VLine, b: VLine): Boolean =
      a.xs.length == b.xs.length &&
        a.xs.zip(b.xs).forall { case (xa, xb) => math.abs(xa - xb) <= 3.0 }
    val rendered = blocks.map { blk =>
      val units = scala.collection.mutable.ArrayBuffer.empty[String]
      val plain = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < blk.length) {
        val runEnd = {
          var j = i
          if (blk(i).cells.length >= 2) {
            while (j + 1 < blk.length && blk(j + 1).cells.length >= 2 &&
              aligned(blk(i), blk(j + 1))) j += 1
          }
          j
        }
        if (runEnd > i) { // >= 2 aligned multi-cell lines: a table
          if (plain.nonEmpty) { units += plain.mkString("\n"); plain.clear() }
          units += rowsToMdTable((i to runEnd).map(blk(_).cells))
          i = runEnd + 1
        } else {
          plain += blk(i).cells.mkString(" ")
          i += 1
        }
      }
      if (plain.nonEmpty) units += plain.mkString("\n")
      units.mkString("\n")
    }
    rendered.mkString("\n\n")
  }

  /** Text of one content stream: positioned evaluation + y-ordered
    * assembly (see [[extractSegments]] / [[assemblePage]]).
    */
  private[multimodal] def extractContentText(content: String): String =
    assemblePage(extractSegments(content))

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
