package graft

import graft.multimodal.DocumentCodec
import graft.multimodal.DocumentCodec.DeckShape
import org.scalatest.funsuite.AnyFunSuite

/** PPTX extraction + the parse→fallback dispatch chain
  * (reference 多数据源获取数据.py:841-911 `_parse_pptx`, 1181-1225 `parse`).
  * Fixtures are assembled from raw bytes in-test — `writeDeck` for the
  * round-trips, hand-built slide XML for the picture/table shapes the
  * writer intentionally doesn't emit.
  */
class PptxCodecSpec extends AnyFunSuite {

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("detectFormat: pptx zip, legacy OLE2, and non-office zip") {
    val deck = DocumentCodec.writeDeck(Seq(Seq(DeckShape(0, "hi"))))
    assert(DocumentCodec.detectFormat(deck) == DocumentCodec.Pptx)
    val ole2 = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1, 0, 0)
      .map(_.toByte)
    assert(DocumentCodec.detectFormat(ole2) == DocumentCodec.LegacyOffice)
    assert(DocumentCodec.detectFormat(zipOf("other.txt" -> "x")) ==
      DocumentCodec.Unknown)
  }

  test("writeDeck round-trip: title header, slide order, --- separators") {
    val deck = DocumentCodec.writeDeck(Seq(
      Seq(DeckShape(0, "Quarterly Review", isTitle = true),
        DeckShape(914400, "Revenue up 12%\nCosts flat")),
      Seq(DeckShape(0, "Outlook", isTitle = true),
        DeckShape(914400, "Guidance unchanged"))))
    val got = DocumentCodec.extractPptx(deck).get
    assert(got ==
      "## 幻灯片 1: Quarterly Review\n\nQuarterly Review\n\nRevenue up 12%\nCosts flat" +
        "\n\n---\n\n" +
        "## 幻灯片 2: Outlook\n\nOutlook\n\nGuidance unchanged")
  }

  test("shapes are emitted top-ordered, not document-ordered") {
    // body shape written FIRST in the XML but with the larger y-offset
    val deck = DocumentCodec.writeDeck(Seq(Seq(
      DeckShape(914400, "body below"),
      DeckShape(0, "Title", isTitle = true))))
    val got = DocumentCodec.extractPptx(deck).get
    assert(got == "## 幻灯片 1: Title\n\nTitle\n\nbody below")
  }

  test("XML-special characters survive the writer/reader round-trip") {
    val text = """a<b & "c" 'd' >e"""
    val deck = DocumentCodec.writeDeck(Seq(Seq(DeckShape(0, text))))
    assert(DocumentCodec.extractPptx(deck).get == s"## 幻灯片 1\n\n$text")
  }

  test("slide entries sort numerically (slide10 after slide2)") {
    def slideXml(t: String) =
      """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" """ +
        """xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""" +
        s"""<p:cSld><p:spTree><p:sp><p:nvSpPr><p:cNvPr id="2" name="s"/>""" +
        """<p:cNvSpPr/><p:nvPr/></p:nvSpPr><p:spPr/>""" +
        s"""<p:txBody><a:p><a:r><a:t>$t</a:t></a:r></a:p></p:txBody></p:sp>""" +
        """</p:spTree></p:cSld></p:sld>"""
    // zip entries deliberately in lexicographic (wrong) order
    val bytes = zipOf(
      "ppt/slides/slide10.xml" -> slideXml("tenth"),
      "ppt/slides/slide2.xml" -> slideXml("second"),
      "ppt/slides/slide1.xml" -> slideXml("first"))
    val got = DocumentCodec.extractPptx(bytes).get
    assert(got.indexOf("first") < got.indexOf("second"))
    assert(got.indexOf("second") < got.indexOf("tenth"))
    // headers re-number by position: 1, 2, 3
    assert(got.contains("## 幻灯片 3\n\ntenth"))
  }

  test("pictures become numbered placeholders, tables become markdown") {
    val slide =
      """<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" """ +
        """xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">""" +
        """<p:cSld><p:spTree>""" +
        // picture at the TOP of the slide
        """<p:pic><p:spPr><a:xfrm><a:off x="0" y="100"/></a:xfrm></p:spPr></p:pic>""" +
        // table below it: 2×2 with a pipe and a newline to escape
        """<p:graphicFrame><p:xfrm><a:off x="0" y="5000"/></p:xfrm><a:tbl>""" +
        """<a:tr><a:tc><a:txBody><a:p><a:r><a:t>h1</a:t></a:r></a:p></a:txBody></a:tc>""" +
        """<a:tc><a:txBody><a:p><a:r><a:t>h|2</a:t></a:r></a:p></a:txBody></a:tc></a:tr>""" +
        """<a:tr><a:tc><a:txBody><a:p><a:r><a:t>v1</a:t></a:r></a:p></a:txBody></a:tc>""" +
        """<a:tc><a:txBody><a:p><a:r><a:t>v2</a:t></a:r></a:p></a:txBody></a:tc></a:tr>""" +
        """</a:tbl></p:graphicFrame>""" +
        // a text shape between them
        """<p:sp><p:nvSpPr><p:cNvPr id="2" name="s"/><p:cNvSpPr/><p:nvPr/></p:nvSpPr>""" +
        """<p:spPr><a:xfrm><a:off x="0" y="3000"/></a:xfrm></p:spPr>""" +
        """<p:txBody><a:p><a:r><a:t>caption</a:t></a:r></a:p></p:txBody></p:sp>""" +
        """</p:spTree></p:cSld></p:sld>"""
    val got = DocumentCodec.extractPptx(zipOf("ppt/slides/slide1.xml" -> slide)).get
    assert(got ==
      "## 幻灯片 1\n\n" +
        "![幻灯片1-图片1](__PPTX_IMG_1__)\n\n" +
        "caption\n\n" +
        "| h1 | h\\|2 |\n| --- | --- |\n| v1 | v2 |")
  }

  test("rowsToMdTable pads ragged rows and truncates long cells") {
    val md = DocumentCodec.rowsToMdTable(Seq(
      Seq("a", "b", "c"), Seq("x" * 100), Seq("1", "2")))
    val lines = md.split("\n")
    assert(lines(0) == "| a | b | c |")
    assert(lines(1) == "| --- | --- | --- |")
    assert(lines(2) == s"| ${"x" * 80} |  |  |")
    assert(lines(3) == "| 1 | 2 |  |")
  }

  test("parse: extension dispatch for pdf/docx/pptx payloads") {
    val deck = DocumentCodec.writeDeck(Seq(Seq(DeckShape(0, "slides"))))
    assert(DocumentCodec.parse(deck, ".pptx") == "## 幻灯片 1\n\nslides")
    assert(DocumentCodec.parse(deck, "pptx") == "## 幻灯片 1\n\nslides") // dot optional
  }

  test("parse: magic-number rescue for a misnamed file") {
    // a PPTX handed in with a .bin extension still decodes via detectFormat
    val deck = DocumentCodec.writeDeck(Seq(Seq(DeckShape(0, "rescued"))))
    assert(DocumentCodec.parse(deck, ".bin") == "## 幻灯片 1\n\nrescued")
  }

  test("parse: plain-text extensions run the F14 decode chain") {
    assert(DocumentCodec.parse("héllo".getBytes("UTF-8"), ".txt") == "héllo")
    // GBK bytes that are NOT valid UTF-8 fall through to the GBK attempt
    val gbk = "中文内容".getBytes("GBK")
    assert(DocumentCodec.parse(gbk, ".md") == "中文内容")
  }

  test("parse: legacy .doc routes straight to the converter seam") {
    var seen: Option[String] = None
    val ole2 = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1, 0, 0)
      .map(_.toByte)
    val out = DocumentCodec.parse(ole2, ".doc",
      fallback = (_, ext) => { seen = Some(ext); Some("converted doc") })
    assert(out == "converted doc")
    assert(seen.contains(".doc"))
  }

  test("parse: empty dedicated result falls back to converter, then marker") {
    val junk = Array[Byte](1, 2, 3, 4)
    // converter present → its output wins
    assert(DocumentCodec.parse(junk, ".pptx",
      fallback = (_, _) => Some("md fallback")) == "md fallback")
    // converter absent → the reference's literal unparseable marker
    assert(DocumentCodec.parse(junk, ".xyz") == "[无法解析 .xyz 格式文件]")
    // blank converter output does NOT count as a parse
    assert(DocumentCodec.parse(junk, ".xyz",
      fallback = (_, _) => Some("  ")) == "[无法解析 .xyz 格式文件]")
  }
}
