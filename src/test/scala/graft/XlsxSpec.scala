package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.Xlsx
import org.scalatest.funsuite.AnyFunSuite

/** S4 — XLSX scan. The fixture workbook is built in-test from raw ECMA-376
  * parts (zip of XML), covering shared strings, inline strings, numbers,
  * sparse rows with explicit cell refs, and XML escapes.
  */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def buildXlsx(sheetRows: String, sharedStrings: Seq[String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst>${
        sharedStrings.map(s => s"<si><t>$s</t></si>").mkString}</sst>""")
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetRows</sheetData></worksheet>""")
    zos.close()
    bos.toByteArray
  }

  test("workbook parses shared strings, inline strings, numbers, sparse refs") {
    val rows =
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>42</v></c><c r="C2" t="inlineStr"><is><t>宝宝&amp;乐园</t></is></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="C3"><v>7.5</v></c></row>""".stripMargin
    val bytes = buildXlsx(rows, Seq("机构名称", "容量", "备注", "甲园", "乙园"))
    val parsed = Xlsx.parseWorkbook(bytes, 100)
    assert(parsed == Seq(
      Seq("机构名称", "容量", "备注"),
      Seq("甲园", "42", "宝宝&乐园"),
      Seq("乙园", "", "7.5")))   // sparse B3 back-filled by the C3 ref
  }

  test("read: header row becomes schema, 500-row cap honored") {
    val header = """<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>name</t></is></c></row>"""
    val body = (2 to 602).map { i =>
      s"""<row r="$i"><c r="A$i"><v>${i - 1}</v></c><c r="B$i" t="inlineStr"><is><t>row${i - 1}</t></is></c></row>"""
    }.mkString
    val bytes = buildXlsx(header + body, Seq.empty)
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toFile
    java.nio.file.Files.write(new java.io.File(dir, "t.xlsx").toPath, bytes)

    val df = Xlsx.read(spark, dir.toString + "/*.xlsx")
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 500)   // cap (O5) — 601 data rows in the file
    assert(df.filter($"id" === "1").select("name").as[String].head() == "row1")
  }

  test("writeWorkbook → read round-trip over many files stays distributed") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxmany").toFile
    (0 until 20).foreach { f =>
      val rows = Seq(Seq("id", "name")) ++
        (0 until 30).map(i => Seq(s"${f * 100 + i}", s"name_${f}_$i"))
      java.nio.file.Files.write(new java.io.File(dir, f"wb_$f%02d.xlsx").toPath,
        Xlsx.writeWorkbook(rows))
    }
    val df = Xlsx.read(spark, dir.toString + "/*.xlsx")
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 600)
    assert(df.filter($"id" === "1203").select("name").as[String].head() == "name_12_3")
    // row assembly must be executor-side: the plan reads the binaryFile
    // source directly — NOT a driver-materialized LocalTableScan (the
    // pre-r3 shape, which funneled every parsed row through the driver)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("binaryFile"), s"expected binaryFile scan in:\n$plan")
    assert(!plan.contains("LocalTableScan"), s"driver-materialized plan:\n$plan")
  }

  test("date-styled cells decode to ISO; 1900 phantom-day parity pinned") {
    // builtin date style via cellXfs index: xf0 general, xf1 numFmtId 14,
    // xf2 a CUSTOM date code, xf3 a custom NON-date code
    val styles =
      """<?xml version="1.0"?><styleSheet>""" +
        """<numFmts count="2"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm"/>""" +
        """<numFmt numFmtId="165" formatCode="#,##0.00"/></numFmts>""" +
        """<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14"/>""" +
        """<xf numFmtId="164"/><xf numFmtId="165"/></cellXfs></styleSheet>"""
    val sheet =
      """<row r="1"><c r="A1"><v>45292</v></c>""" +          // no style: plain number
        """<c r="B1" s="1"><v>45292</v></c>""" +             // builtin date
        """<c r="C1" s="2"><v>45292.25</v></c>""" +          // custom date+time
        """<c r="D1" s="3"><v>45292</v></c>""" +             // custom non-date
        """<c r="E1" s="1"><v>59</v></c>""" +                // phantom-day region
        """<c r="F1" s="1"><v>60</v></c>""" +
        """<c r="G1" s="1"><v>61</v></c></row>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/styles.xml", styles)
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheet</sheetData></worksheet>""")
    zos.close()
    val rows = Xlsx.parseWorkbook(bos.toByteArray, 10)
    assert(rows == Seq(Seq("45292", "2024-01-01", "2024-01-01 06:00:00", "45292",
      // openpyxl from_excel: serials below 60 shift +1, so 59 and 60 both
      // land on 1900-02-28 and 61 on 1900-03-01 (the phantom 1900-02-29)
      "1900-02-28", "1900-02-28", "1900-03-01")), rows)
  }

  test("writeWorkbook dateCols round-trips ISO dates and datetimes") {
    val rows = Seq(
      Seq("id", "event_date", "event_ts"),
      Seq("1", "2024-01-01", "2024-01-01 06:00:00"),
      Seq("2", "2020-02-29", "1999-12-31 23:59:59"))
    val bytes = Xlsx.writeWorkbook(rows, dateCols = Set(1, 2))
    assert(Xlsx.parseWorkbook(bytes, 10) == rows)
  }

  test("read fails loudly when a file's header differs from the first file's") {
    def sheet(h1: String, h2: String, v: String) =
      s"""<row r="1"><c r="A1" t="inlineStr"><is><t>$h1</t></is></c><c r="B1" t="inlineStr"><is><t>$h2</t></is></c></row>""" +
        s"""<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>$v</t></is></c></row>"""
    val dir = java.nio.file.Files.createTempDirectory("xlsxmix").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.xlsx").toPath,
      buildXlsx(sheet("id", "name", "x"), Seq.empty))
    java.nio.file.Files.write(new java.io.File(dir, "b.xlsx").toPath,
      buildXlsx(sheet("name", "id", "y"), Seq.empty))   // reordered columns
    val e = intercept[IllegalArgumentException] {
      Xlsx.read(spark, dir.toString + "/*.xlsx")
    }
    assert(e.getMessage.contains("header mismatch"))
  }
}
