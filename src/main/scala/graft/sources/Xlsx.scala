package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S4 — minimal XLSX scan without external dependencies: an .xlsx file is a
  * zip of XML parts (ECMA-376); this reads `xl/sharedStrings.xml` and the
  * first worksheet, resolving shared strings, inline strings and numeric
  * cells, honoring cell references (sparse rows keep column alignment).
  *
  * Distributed shape: `binaryFile` source lifts the workbook bytes onto
  * executors, `flatMap` parses per file — many workbooks parse in parallel,
  * matching the reference's per-file openpyxl loop (多数据源获取数据.py:
  * 914-956) with its 500-row cap and first-row header convention.
  */
object Xlsx {

  val DefaultCap = 500

  // ---- date serials (1900 system, openpyxl parity) ------------------------

  /** Builtin ECMA-376 number-format ids that render as dates/times —
    * openpyxl's BUILTIN_FORMATS date set (14–22 date/time, 27–36 era
    * dates, 45–47 durations, 50–58 CJK dates).
    */
  private[sources] val BuiltinDateFmtIds: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** openpyxl `is_date_format`: a custom format code is a date format when
    * it contains any of `dmhys` OUTSIDE quoted literals and `[...]`
    * sections (colors, locale prefixes, elapsed-time brackets).
    */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val stripped = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "") // escaped literal chars (\-, \y, …)
    stripped.exists(c => "dmhysDMHYS".indexOf(c) >= 0)
  }

  private val SerialEpoch = java.time.LocalDate.of(1899, 12, 30)

  /** 1900-system serial → ISO string: whole serials render as
    * `yyyy-MM-dd`, fractional ones as `yyyy-MM-dd HH:mm:ss` (seconds
    * rounded). openpyxl `from_excel` parity, including the phantom
    * 1900-02-29 handling: serials below 60 shift forward one day, so 59
    * and 60 both land on 1900-02-28 and 61 on 1900-03-01.
    */
  private[sources] def serialToIso(serial: Double): String = {
    var day = math.floor(serial).toLong
    val frac = serial - day
    if (serial >= 0 && serial < 60) day += 1
    val date = SerialEpoch.plusDays(day)
    if (frac == 0.0) date.toString
    else {
      val secs = math.round(frac * 86400.0)
      val t = java.time.LocalTime.ofSecondOfDay(math.min(secs, 86399L))
      s"$date ${t.format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss"))}"
    }
  }

  /** ISO `yyyy-MM-dd` / `yyyy-MM-dd HH:mm:ss` → 1900-system serial —
    * the writer half's inverse of [[serialToIso]] (modern dates only:
    * the phantom-day region below serial 61 is not writable).
    */
  private[sources] def isoToSerial(iso: String): Double = {
    val (datePart, timePart) = iso.indexOf(' ') match {
      case -1 => (iso, "")
      case i => (iso.substring(0, i), iso.substring(i + 1))
    }
    val date = java.time.LocalDate.parse(datePart)
    val days = java.time.temporal.ChronoUnit.DAYS.between(SerialEpoch, date)
    require(days >= 61, s"dates before 1900-03-01 are not serial-writable: $iso")
    if (timePart.isEmpty) days.toDouble
    else {
      val t = java.time.LocalTime.parse(timePart)
      days.toDouble + t.toSecondOfDay / 86400.0
    }
  }

  /** Read all .xlsx files under `path` (glob ok) into a DataFrame with
    * string columns named by each file's header row; schemas must agree
    * across files. Rows capped per file.
    *
    * Distributed shape: the ONLY driver-side state is the schema, derived
    * from the lexicographically-first file's header (one bounded collect of
    * header rows — a few strings per FILE, not per row). Cell data is
    * parsed and aligned on executors and never funneled through the
    * driver, so a directory of 100k workbooks streams through like any
    * other source. A file whose header mismatches the schema-defining one
    * fails the job from the executor (positional mapping would otherwise
    * silently misalign its columns).
    */
  def read(spark: SparkSession, path: String, cap: Int = DefaultCap): DataFrame =
    TabularGrid.read(spark, path, cap, parseWorkbook, "XLSX")

  /** Render rows (first row = header) as a minimal ECMA-376 workbook:
    * one sheet, every cell an inline string — the writer half of the S4
    * surface, and the fixture generator for the q82 round-trip oracle.
    * Output parses back identically through [[read]]/[[parseWorkbook]].
    *
    * `dateCols`: column indexes whose non-header cells hold ISO dates /
    * datetimes — written as 1900-system serials styled with the builtin
    * `yyyy-mm-dd` format (numFmtId 14), the typed-cell shape openpyxl
    * emits, so the reader's date decode is what round-trips them (q155).
    */
  def writeWorkbook(rows: Seq[Seq[String]], dateCols: Set[Int] = Set.empty): Array[Byte] = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&apos;")
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def fmtSerial(d: Double): String =
      if (d == math.rint(d)) d.toLong.toString else d.toString
    val sheetXml = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (cells, r) =>
      sheetXml.append(s"""<row r="${r + 1}">""")
      cells.zipWithIndex.foreach { case (v, c) =>
        if (r > 0 && dateCols.contains(c) && v.nonEmpty) {
          sheetXml.append(
            s"""<c r="${colRef(c)}${r + 1}" s="1"><v>${fmtSerial(isoToSerial(v))}</v></c>""")
        } else {
          sheetXml.append(
            s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
        }
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>")
    val stylesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<cellXfs count="2"><xf numFmtId="0" applyNumberFormat="0"/>""" +
        """<xf numFmtId="14" applyNumberFormat="1"/></cellXfs></styleSheet>"""
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""
    val typesXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml", typesXml)
    put("xl/workbook.xml", workbookXml)
    put("xl/_rels/workbook.xml.rels", relsXml)
    if (dateCols.nonEmpty) put("xl/styles.xml", stylesXml)
    put("xl/worksheets/sheet1.xml", sheetXml.toString)
    zos.close()
    bos.toByteArray
  }

  /** Parse one workbook's bytes → rows of cell strings (first sheet).
    * Date-formatted numeric cells (style → numFmt, builtin date ids or a
    * custom date code) decode to ISO date/datetime strings — openpyxl
    * returns typed datetimes for these; a raw serial would round-trip as
    * a meaningless number (r6 verdict #5).
    */
  def parseWorkbook(bytes: Array[Byte], maxRows: Int): Seq[Seq[String]] = {
    var shared: Vector[String] = Vector.empty
    var dateStyles: Set[Int] = Set.empty
    // first sheet = lowest-numbered worksheet part (a workbook whose
    // original Sheet1 was deleted stores its first sheet as sheet2.xml etc.)
    val sheets = scala.collection.mutable.TreeMap.empty[Int, String]
    val SheetName = "xl/worksheets/sheet(\\d*)\\.xml".r
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zis.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => shared = parseSharedStrings(readAll(zis))
          case "xl/styles.xml" => dateStyles = parseDateStyles(readAll(zis))
          case SheetName(num) =>
            // bounded: stop inflating once maxRows </row> markers passed —
            // the header pass (maxRows=1) and the 500-row cap never pay
            // for a million-row sheet
            sheets(if (num.isEmpty) 0 else num.toInt) = readSheetRows(zis, maxRows)
          case _ =>
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    sheets.headOption.map { case (_, xml) => parseSheet(xml, shared, dateStyles, maxRows) }
      .getOrElse(Seq.empty)
  }

  private val NumFmtRe =
    """<numFmt[^>]*numFmtId="(\d+)"[^>]*formatCode="([^"]*)"""".r
  private val CellXfsRe = "(?s)<cellXfs[^>]*>(.*?)</cellXfs>".r
  private val XfRe = "<xf[^>]*>|<xf[^>]*/>".r
  private val XfNumFmtIdRe = """numFmtId="(\d+)"""".r

  /** Style indexes (cellXfs positions) whose numFmt is a date format. */
  private[sources] def parseDateStyles(stylesXml: String): Set[Int] = {
    val customDateIds = NumFmtRe.findAllMatchIn(stylesXml).collect {
      case m if isDateFormatCode(unescape(m.group(2))) => m.group(1).toInt
    }.toSet
    CellXfsRe.findFirstMatchIn(stylesXml).map { xfs =>
      XfRe.findAllMatchIn(xfs.group(1)).zipWithIndex.collect {
        case (xf, i) if XfNumFmtIdRe.findFirstMatchIn(xf.matched).exists { idm =>
          val id = idm.group(1).toInt
          BuiltinDateFmtIds.contains(id) || customDateIds.contains(id)
        } => i
      }.toSet
    }.getOrElse(Set.empty)
  }

  private def readAll(zis: ZipInputStream): String = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = zis.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = zis.read(tmp) }
    buf.toString("UTF-8")
  }

  /** Read a worksheet entry only until `maxRows` `</row>` markers have
    * passed (byte-level scan with a marker-length overlap carry, so a
    * marker split across read chunks still counts). A trailing partial
    * row is ignored by the row regex downstream.
    */
  private def readSheetRows(zis: ZipInputStream, maxRows: Int): String = {
    val marker = "</row>".getBytes("UTF-8")
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var carry = Array.empty[Byte]
    var rows = 0
    var n = zis.read(tmp)
    while (n >= 0 && rows < maxRows) {
      buf.write(tmp, 0, n)
      val seg = new Array[Byte](carry.length + n)
      System.arraycopy(carry, 0, seg, 0, carry.length)
      System.arraycopy(tmp, 0, seg, carry.length, n)
      var i = 0
      while (i <= seg.length - marker.length) {
        var j = 0
        while (j < marker.length && seg(i + j) == marker(j)) j += 1
        if (j == marker.length) { rows += 1; i += marker.length } else i += 1
      }
      carry = seg.takeRight(marker.length - 1)
      n = if (rows < maxRows) zis.read(tmp) else -1
    }
    buf.toString("UTF-8")
  }

  private val SiRe = "(?s)<si>(.*?)</si>".r
  private val TRe = "(?s)<t[^>]*>(.*?)</t>".r

  private def parseSharedStrings(xml: String): Vector[String] =
    SiRe.findAllMatchIn(xml).map { m =>
      TRe.findAllMatchIn(m.group(1)).map(t => unescape(t.group(1))).mkString
    }.toVector

  private val RowRe = "(?s)<row[^>]*>(.*?)</row>".r
  private val CellRe = """(?s)<c([^>]*?)(?:/>|>(.*?)</c>)""".r
  private val RefRe = """r="([A-Z]+)\d+"""".r
  private val TypeRe = """t="([A-Za-z]+)"""".r
  private val StyleRe = """s="(\d+)"""".r
  private val VRe = "(?s)<v>(.*?)</v>".r
  private val IsRe = "(?s)<is>(.*?)</is>".r

  private def parseSheet(xml: String, shared: Vector[String],
      dateStyles: Set[Int], maxRows: Int): Seq[Seq[String]] =
    RowRe.findAllMatchIn(xml).take(maxRows).map { rm =>
      val cells = scala.collection.mutable.ArrayBuffer.empty[String]
      CellRe.findAllMatchIn(rm.group(1)).foreach { cm =>
        val attrs = cm.group(1)
        val body = Option(cm.group(2)).getOrElse("")
        val colIdx = RefRe.findFirstMatchIn(attrs)
          .map(m => colToIndex(m.group(1))).getOrElse(cells.length)
        while (cells.length < colIdx) cells += ""
        val cellType = TypeRe.findFirstMatchIn(attrs).map(_.group(1)).getOrElse("n")
        val value = cellType match {
          case "s" => VRe.findFirstMatchIn(body)
            .map(v => shared.lift(v.group(1).trim.toInt).getOrElse("")).getOrElse("")
          case "inlineStr" => IsRe.findFirstMatchIn(body)
            .map(is => TRe.findAllMatchIn(is.group(1)).map(t => unescape(t.group(1))).mkString)
            .getOrElse("")
          case _ =>
            val raw = VRe.findFirstMatchIn(body).map(v => unescape(v.group(1))).getOrElse("")
            val isDate = cellType == "n" &&
              StyleRe.findFirstMatchIn(attrs).exists(m => dateStyles(m.group(1).toInt))
            if (isDate && raw.nonEmpty)
              try serialToIso(raw.trim.toDouble)
              catch { case _: NumberFormatException => raw }
            else raw
        }
        cells += value
      }
      cells.toSeq
    }.toSeq

  private def colToIndex(ref: String): Int =
    ref.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private val NumRefRe = "&#(x?)([0-9A-Fa-f]+);".r

  /** XML entity decode — shared with the DOCX side of DocumentCodec. */
  private[graft] def unescape(s: String): String = {
    val numeric = NumRefRe.replaceAllIn(s, m => {
      val cp = Integer.parseInt(m.group(2), if (m.group(1).isEmpty) 10 else 16)
      java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
    })
    numeric.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
  }
}

/** The shared two-pass spreadsheet-read shape behind [[Xlsx.read]] and
  * [[Biff.read]] — the format supplies only `parse(bytes, maxRows)`.
  *
  * Distributed shape: the ONLY driver-side state is the schema, derived
  * from the lexicographically-first file's header (one bounded collect of
  * header rows — a few strings per FILE, not per row). Cell data is
  * parsed and aligned on executors and never funneled through the
  * driver, so a directory of 100k workbooks streams through like any
  * other source. A file whose header mismatches the schema-defining one
  * fails the job from the executor (positional mapping would otherwise
  * silently misalign its columns).
  */
private[graft] object TabularGrid {

  def read(spark: SparkSession, path: String, cap: Int,
      parse: (Array[Byte], Int) => Seq[Seq[String]], label: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    // Pass 1 (bounded): one header per file → driver picks the schema from
    // the first PARSEABLE file by path order and validates agreement in
    // ONE place. Unparseable/empty workbooks contribute no rows in pass 2
    // either, so they are skipped here too rather than failing the read
    // (or worse, being reported as a "header mismatch" with no header).
    val headers = bin.as[(String, Array[Byte])].map { case (p, bytes) =>
      (p, parse(bytes, 1).headOption.getOrElse(Seq.empty))
    }.collect().sortBy(_._1).filter(_._2.nonEmpty)
    require(headers.nonEmpty, s"no rows parsed from $path")
    val (firstPath, header) = headers.head
    val badFiles = headers.collect { case (p, h) if h != header => p }
    require(badFiles.isEmpty,
      s"$label header mismatch: expected ${header.mkString("[", ", ", "]")} " +
        s"(from $firstPath) but differs in: ${badFiles.mkString(", ")}")
    // Pass 2 (distributed): parse + align rows entirely on executors.
    val width = header.length
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    bin.as[(String, Array[Byte])].flatMap { case (p, bytes) =>
      parse(bytes, cap + 1) match {
        case fileHeader +: data =>
          require(fileHeader == header,
            s"$label header mismatch in $p: expected ${header.mkString("[", ", ", "]")}")
          data.take(cap).map(cells =>
            Row.fromSeq((0 until width).map(i => cells.lift(i).filter(_.nonEmpty).orNull)))
        case _ => Seq.empty[Row]
      }
    }.toDF()
  }
}
