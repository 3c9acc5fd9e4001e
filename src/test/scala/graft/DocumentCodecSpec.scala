package graft

import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.multimodal.{DocumentCodec, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S5 codec — golden fixtures built in-test from raw format bytes:
  * WordprocessingML zips for DOCX, hand-assembled object streams (plain and
  * Flate-compressed) for PDF. No external libraries on either side.
  */
class DocumentCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def buildDocx(documentXml: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("[Content_Types].xml"))
    zos.write("<Types/>".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(documentXml.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  private def buildPdf(contentStream: String, flate: Boolean): Array[Byte] = {
    val data =
      if (flate) {
        val d = new Deflater()
        d.setInput(contentStream.getBytes("ISO-8859-1")); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } else contentStream.getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    val filter = if (flate) " /Filter /FlateDecode" else ""
    bos.write(s"4 0 obj\n<< /Length ${data.length}$filter >>\nstream\n"
      .getBytes("ISO-8859-1"))
    bos.write(data)
    bos.write("\nendstream\nendobj\n%%EOF\n".getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  private val docxXml =
    """<?xml version="1.0"?><w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
      """<w:p><w:r><w:t>机构名称：阳光</w:t></w:r><w:r><w:t xml:space="preserve"> 幼儿园</w:t></w:r></w:p>""" +
      """<w:p><w:r><w:t>Line two &amp; more</w:t><w:br/><w:t>after break</w:t></w:r></w:p>""" +
      """<w:p/></w:body></w:document>"""

  test("DOCX: runs concatenate, paragraphs break, breaks and entities decode") {
    val got = DocumentCodec.extractDocx(buildDocx(docxXml))
    assert(got.exists(_.contains("机构名称：阳光 幼儿园\nLine two & more\nafter break")))
  }

  private val pdfContent =
    "BT /F1 12 Tf (Hello) Tj T* (World \\(escaped\\)) Tj 0 -14 Td ([octal\\040space]) Tj ET"

  test("PDF: plain content stream — Tj/Td/T* text with escapes") {
    val got = DocumentCodec.extractPdf(buildPdf(pdfContent, flate = false))
    assert(got.exists(_.contains("Hello\nWorld (escaped)\n[octal space]")))
  }

  test("PDF: FlateDecode content stream inflates to the same text") {
    val got = DocumentCodec.extractPdf(buildPdf(pdfContent, flate = true))
    assert(got.exists(_.contains("Hello\nWorld (escaped)\n[octal space]")))
  }

  test("PDF: TJ array and ' move-then-show ordering") {
    val c = "BT [(a) -120 (b) 3 (c)] TJ (next) ' ET"
    val got = DocumentCodec.extractPdf(buildPdf(c, flate = false))
    assert(got.exists(_.contains("abc\nnext")))
  }

  test("PDF: hex strings decode; image/font streams are skipped, not scanned") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    // an "image" stream whose bytes contain a parenthesized decoy
    val img = "garbage(NOT TEXT)more\u0000garbage"
    w(s"1 0 obj\n<< /Subtype /Image /Length ${img.length} >>\nstream\n")
    w(img)
    w("\nendstream\nendobj\n")
    val content = "BT <48656C6C6F> Tj T* (bye) Tj ET"
    w(s"2 0 obj\n<< /Length ${content.length} >>\nstream\n")
    w(content)
    w("\nendstream\nendobj\n%%EOF\n")
    val got = DocumentCodec.extractPdf(bos.toByteArray)
    assert(got.exists(_.contains("Hello\nbye")))
    assert(!got.exists(_.contains("NOT TEXT")))
  }

  test("PDF: dict hex values and non-text streams never leak into output") {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    // a font-ish stream: no image subtype, contains parens AND hex, but no
    // BT block — must be skipped by the content gate
    val font = "sfnt(GARBAGE)<4141>junk obj inside"
    w(s"1 0 obj\n<< /Length ${font.length} /Length1 99 >>\nstream\n")
    w(font)
    w("\nendstream\nendobj\n")
    // tagged content: the BDC property dict's hex value must NOT be shown
    val content = "BT /Span <</ActualText <FEFF0048>>> BDC (Hi) Tj EMC ET"
    w(s"2 0 obj\n<< /Length ${content.length} /Title (project objectives) >>\nstream\n")
    w(content)
    w("\nendstream\nendobj\n%%EOF\n")
    val got = DocumentCodec.extractPdf(bos.toByteArray)
    assert(got.exists(_.contains("Hi")), got)
    assert(!got.exists(_.contains("GARBAGE")))
    assert(!got.exists(_.contains("þH")))   // FEFF0048 must not decode
    assert(!got.exists(_.contains("AA")))        // font hex must not decode
  }

  test("PDF: out-of-stream-order blocks assemble top-down by y") {
    import DocumentCodec.PdfElem
    // stream order deliberately bottom-up + interleaved: the reader must
    // reorder purely by y (the reference's bbox ordering)
    val page = Seq(
      PdfElem(72, 700, "second paragraph"),
      PdfElem(72, 780, "Title Line"),
      PdfElem(72, 740, "first paragraph"))
    val got = DocumentCodec.extractPdf(DocumentCodec.writePdf(Seq(page)))
    assert(got.contains("Title Line\nfirst paragraph\nsecond paragraph"), got)
  }

  test("PDF: aligned multi-cell rows render as a markdown table; blocks split on big gaps") {
    import DocumentCodec.PdfElem
    val page = Seq(
      PdfElem(72, 780, "Report"),
      // two columns of a 3-row table, far below the heading
      PdfElem(72, 600, "name"), PdfElem(300, 600, "count"),
      PdfElem(72, 580, "alpha"), PdfElem(300, 580, "12"),
      PdfElem(72, 560, "beta"), PdfElem(300, 560, "7"),
      PdfElem(72, 480, "footer text"))
    val got = DocumentCodec.extractPdf(DocumentCodec.writePdf(Seq(page))).get
    val expectedTable =
      "| name | count |\n| --- | --- |\n| alpha | 12 |\n| beta | 7 |"
    assert(got.contains(expectedTable), got)
    // heading and footer separated from the table block by blank lines
    assert(got.contains("Report\n\n|"), got)
    assert(got.contains("|\n\nfooter text"), got)
  }

  test("PDF: side-by-side columns interleave in reading order (y-sort)") {
    import DocumentCodec.PdfElem
    // a two-column layout written column-by-column; same-y lines merge
    // left-to-right — but unequal-width columns never align as a table
    val page = Seq(
      PdfElem(72, 700, "L1"), PdfElem(72, 686, "L2"),
      PdfElem(300, 700, "R1 long cell"), PdfElem(300, 686, "R2"))
    val got = DocumentCodec.extractPdf(DocumentCodec.writePdf(Seq(page))).get
    assert(got.contains("| L1 | R1 long cell |\n| --- | --- |\n| L2 | R2 |") ||
      got.contains("L1 R1 long cell\nL2 R2"), got)
  }

  test("detectFormat: magic numbers dispatch; junk is unknown") {
    assert(DocumentCodec.detectFormat(buildDocx(docxXml)) == DocumentCodec.Docx)
    assert(DocumentCodec.detectFormat(buildPdf(pdfContent, flate = false)) == DocumentCodec.Pdf)
    assert(DocumentCodec.detectFormat("just text".getBytes) == DocumentCodec.Unknown)
    assert(DocumentCodec.extractText("just text".getBytes).isEmpty)
  }

  test("parseDocuments: distributed decode keeps undecodable rows with null text") {
    val rows = Seq(
      (1L, buildDocx(docxXml)),
      (2L, buildPdf(pdfContent, flate = true)),
      (3L, "plain bytes, not a document".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.parseDocuments(rows)
      .orderBy("media_id")
      .select("media_id", "doc_format", "text")
      .as[(Long, String, Option[String])].collect()
    assert(got(0)._2 == "docx" && got(0)._3.get.startsWith("机构名称：阳光 幼儿园"))
    assert(got(1)._2 == "pdf" && got(1)._3.get.startsWith("Hello"))
    assert(got(2)._2 == "unknown" && got(2)._3.isEmpty)
  }
}
