package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4's legacy half — Excel 97-2003 (.xls, BIFF8) worksheet decode, the
  * format the reference falls back to xlrd for (多数据源获取数据.py:914-956:
  * openpyxl first, xlrd when the zip sniff fails). Scraped government
  * corpora are full of old .xls files, so the engine decodes them for real
  * rather than punting to the converter seam.
  *
  * An .xls file is a CFB container ([[graft.multimodal.Ole2]]) whose
  * `Workbook` stream is a sequence of BIFF records (type:u16 len:u16
  * payload, all little-endian): a workbook-globals substream (BOF, SST
  * shared-string table, one BOUNDSHEET per sheet carrying the absolute
  * offset of that sheet's substream, EOF), then per-sheet substreams of
  * cell records. This decoder walks the records the reference's xlrd path
  * materializes values from:
  *
  *   - `SST` (0x00FC) + `CONTINUE` (0x003C): shared strings, including
  *     strings SPLIT across continuation records — each continuation that
  *     starts mid-string re-declares the compressed/UTF-16 flag byte.
  *   - `LABELSST` (0x00FD) string cells, `LABEL` (0x0204) inline strings.
  *   - `NUMBER` (0x0203) IEEE doubles, `RK` (0x027E) / `MULRK` (0x00BD)
  *     packed numbers (30-bit int or truncated double, optional /100).
  *   - `BOOLERR` (0x0205) booleans/errors.
  *
  * Numbers render exactly like the reference's xlrd→str path for integral
  * values: no trailing `.0` (an RK int and a NUMBER holding 42.0 both
  *  render "42"); non-integral doubles use JVM double formatting.
  *
  * Distributed shape: identical to [[Xlsx]] — `binaryFile` lifts workbook
  * bytes onto executors, [[TabularGrid.read]] derives the schema from one
  * bounded header pass and parses cell data entirely on executors.
  *
  * The writer emits the same record set (SST with CONTINUE splits at a
  * configurable record capacity, LABELSST/NUMBER/RK/MULRK cells) inside a
  * real CFB container — the fixture generator for the q133 round-trip
  * oracle and the adversarial continuation specs.
  */
object Biff {

  val DefaultCap: Int = Xlsx.DefaultCap

  /** Read all .xls files under `path` (glob ok) into a DataFrame with
    * string columns named by each file's header row; schemas must agree
    * across files. Rows capped per file.
    */
  def read(spark: SparkSession, path: String, cap: Int = DefaultCap): DataFrame =
    TabularGrid.read(spark, path, cap, parseWorkbook, "XLS")

  /** Parse one .xls file's bytes → rows of cell strings (first sheet,
    * rows in sheet order, ragged to each row's last populated column).
    */
  def parseWorkbook(bytes: Array[Byte], maxRows: Int): Seq[Seq[String]] =
    graft.multimodal.Ole2.readStreams(bytes)
      .flatMap(_.get("Workbook"))
      .map(wb => parseBiffStream(wb, maxRows))
      .getOrElse(Seq.empty)

  // ---- record-stream reader -----------------------------------------------

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    u16(b, i).toLong | (u16(b, i + 2).toLong << 16)

  /** Integral doubles render without the trailing ".0" (xlrd-style). */
  private[graft] def fmtNum(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** RK packed number: bit0 = value is ×100, bit1 = 30-bit signed int vs
    * high 30 bits of an IEEE double (MS-XLS 2.5.122).
    */
  private[graft] def rkValue(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100 else v
  }

  /** Parse a BIFF8 `Workbook` stream: globals substream for SST +
    * BOUNDSHEET offsets, then the FIRST sheet substream's cell records.
    */
  private[graft] def parseBiffStream(wb: Array[Byte], maxRows: Int): Seq[Seq[String]] = {
    if (wb.length < 4 || u16(wb, 0) != 0x0809) return Seq.empty
    var sst: Vector[String] = Vector.empty
    val sheetOffsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    // date decode state (r6 verdict #5, xlrd parity): FORMAT records map
    // ifmt → code, XF records list ifmt per style index; a numeric cell
    // whose ixfe points at a date ifmt decodes to ISO instead of a serial
    val customDateIfmts = scala.collection.mutable.Set.empty[Int]
    val xfIfmts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = 0
    var stop = false
    while (!stop && p + 4 <= wb.length) {
      val typ = u16(wb, p)
      val len = u16(wb, p + 2)
      val body = p + 4
      if (body + len > wb.length) stop = true
      else {
        typ match {
          case 0x00FC => // SST: payload + immediately-following CONTINUEs
            val segs = scala.collection.mutable.ArrayBuffer(
              java.util.Arrays.copyOfRange(wb, body, body + len))
            var q = body + len
            while (q + 4 <= wb.length && u16(wb, q) == 0x003C) {
              val clen = u16(wb, q + 2)
              if (q + 4 + clen > wb.length) { q = wb.length }
              else {
                segs += java.util.Arrays.copyOfRange(wb, q + 4, q + 4 + clen)
                q += 4 + clen
              }
            }
            sst = parseSst(segs.toIndexedSeq)
          case 0x041E if len >= 5 => // FORMAT: ifmt u16 + XLUnicodeString
            val ifmt = u16(wb, body)
            val code = new SstCursor(IndexedSeq(
              java.util.Arrays.copyOfRange(wb, body + 2, body + len))).readString()
            if (Xlsx.isDateFormatCode(code)) customDateIfmts += ifmt: Unit
          case 0x00E0 if len >= 4 => // XF: ifnt u16, ifmt u16
            xfIfmts += u16(wb, body + 2)
          case 0x0085 => // BOUNDSHEET: lbPlyPos u32 (name not needed)
            if (len >= 4) sheetOffsets += u32(wb, body).toInt
          case 0x000A => stop = true // EOF of the globals substream
          case _ => ()
        }
        p = body + len
      }
    }
    val dateXfs = xfIfmts.zipWithIndex.collect {
      case (ifmt, i) if Xlsx.BuiltinDateFmtIds.contains(ifmt) ||
        customDateIfmts.contains(ifmt) => i
    }.toSet
    sheetOffsets.headOption.map(off => parseSheetCells(wb, off, sst, dateXfs, maxRows))
      .getOrElse(Seq.empty)
  }

  /** Walk one sheet substream's cell records into ragged rows. */
  private def parseSheetCells(
      wb: Array[Byte], start: Int, sst: Vector[String], dateXfs: Set[Int],
      maxRows: Int): Seq[Seq[String]] = {
    def num(ixfe: Int, d: Double): String =
      if (dateXfs(ixfe)) Xlsx.serialToIso(d) else fmtNum(d)
    if (start < 0 || start + 4 > wb.length || u16(wb, start) != 0x0809)
      return Seq.empty
    // (row → col → value); TreeMaps keep sheet order without assuming the
    // record order (MULRK/RK rows may interleave arbitrarily)
    val grid = scala.collection.mutable.TreeMap.empty[Int,
      scala.collection.mutable.TreeMap[Int, String]]
    def put(row: Int, colIdx: Int, v: String): Unit =
      if (row >= 0 && row < maxRows && colIdx >= 0 && colIdx < 16384)
        grid.getOrElseUpdate(row,
          scala.collection.mutable.TreeMap.empty[Int, String])(colIdx) = v
    var p = start
    var stop = false
    while (!stop && p + 4 <= wb.length) {
      val typ = u16(wb, p)
      val len = u16(wb, p + 2)
      val body = p + 4
      if (body + len > wb.length) stop = true
      else {
        typ match {
          case 0x000A => stop = true // sheet EOF
          case 0x00FD if len >= 10 => // LABELSST
            val isst = u32(wb, body + 6).toInt
            put(u16(wb, body), u16(wb, body + 2),
              if (isst >= 0 && isst < sst.length) sst(isst) else "")
          case 0x0203 if len >= 14 => // NUMBER
            val bits = u32(wb, body + 6) | (u32(wb, body + 10) << 32)
            put(u16(wb, body), u16(wb, body + 2),
              num(u16(wb, body + 4), java.lang.Double.longBitsToDouble(bits)))
          case 0x027E if len >= 10 => // RK
            put(u16(wb, body), u16(wb, body + 2),
              num(u16(wb, body + 4), rkValue(u32(wb, body + 6).toInt)))
          case 0x00BD if len >= 12 => // MULRK: rw, colFirst, n×(ixfe,rk), colLast
            val row = u16(wb, body)
            val colFirst = u16(wb, body + 2)
            val n = (len - 6) / 6
            var i = 0
            while (i < n) {
              put(row, colFirst + i,
                num(u16(wb, body + 4 + 6 * i),
                  rkValue(u32(wb, body + 4 + 6 * i + 2).toInt)))
              i += 1
            }
          case 0x0204 if len >= 9 => // LABEL: inline XLUnicodeString
            val cur = new SstCursor(IndexedSeq(
              java.util.Arrays.copyOfRange(wb, body + 6, body + len)))
            put(u16(wb, body), u16(wb, body + 2), cur.readString())
          case 0x0205 if len >= 8 => // BOOLERR
            val v = wb(body + 6) & 0xFF
            val isErr = (wb(body + 7) & 0xFF) != 0
            put(u16(wb, body), u16(wb, body + 2),
              if (isErr) s"#ERR:$v" else if (v != 0) "TRUE" else "FALSE")
          case _ => ()
        }
        if (!stop) p = body + len
      }
    }
    grid.values.map { cols =>
      val width = if (cols.isEmpty) 0 else cols.lastKey + 1
      (0 until width).map(c => cols.getOrElse(c, "")).toSeq
    }.toSeq
  }

  // ---- SST (with CONTINUE) ------------------------------------------------

  /** Cursor over the SST record's payload segments (the SST body plus each
    * CONTINUE body). Fixed-width fields read straight across segment
    * boundaries; CHARACTER data crossing into a continuation re-reads the
    * option-flags byte there (MS-XLS 2.5.293: a continued string's
    * compressed/UTF-16 width may differ per continuation).
    */
  private final class SstCursor(segs: IndexedSeq[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def ensure(): Unit = {
      while (si < segs.length && off >= segs(si).length) { si += 1; off = 0 }
    }
    def exhausted: Boolean = { ensure(); si >= segs.length }
    def u8(): Int = {
      ensure()
      if (si >= segs.length) return 0
      val v = segs(si)(off) & 0xFF; off += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      var r = n
      while (r > 0) {
        ensure()
        if (si >= segs.length) return
        val take = math.min(r, (segs(si).length - off).toLong)
        off += take.toInt; r -= take
      }
    }
    def readString(): String = {
      val cch = u16()
      val grbit = u8()
      val rich = (grbit & 0x08) != 0
      val phonetic = (grbit & 0x04) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (phonetic) u32() else 0L
      var high = (grbit & 0x01) != 0
      val sb = new java.lang.StringBuilder(cch)
      var remaining = cch
      while (remaining > 0) {
        if (si < segs.length && off >= segs(si).length) {
          // crossing into a CONTINUE mid-string: fresh option-flags byte
          ensure()
          if (si >= segs.length) remaining = 0
          else high = (u8() & 0x01) != 0
        }
        if (remaining > 0) {
          if (si >= segs.length) remaining = 0 // truncated stream
          else {
            val seg = segs(si)
            val avail = seg.length - off
            val width = if (high) 2 else 1
            val take = math.min(remaining, avail / width)
            if (take <= 0) off = seg.length // malformed odd split: realign
            else {
              var i = 0
              while (i < take) {
                val c =
                  if (high) ((seg(off) & 0xFF) | ((seg(off + 1) & 0xFF) << 8)).toChar
                  else (seg(off) & 0xFF).toChar
                sb.append(c)
                off += width; i += 1
              }
              remaining -= take
            }
          }
        }
      }
      skip(4L * cRun) // rich-text runs
      skip(cbExt)     // phonetic block
      sb.toString
    }
  }

  /** SST payload: cstTotal u32, cstUnique u32, then cstUnique strings. */
  private def parseSst(segs: IndexedSeq[Array[Byte]]): Vector[String] = {
    if (segs.isEmpty || segs.head.length < 8) return Vector.empty
    val cur = new SstCursor(segs)
    cur.skip(4) // cstTotal
    val unique = cur.u32().toInt
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < unique && !cur.exhausted) { out += cur.readString(); i += 1 }
    out.result()
  }

  // ---- writer (fixtures / sink) -------------------------------------------

  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(typ.toShort); b.putShort(payload.length.toShort); b.put(payload)
    b.array()
  }

  private def bof(dt: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x0600.toShort); b.putShort(dt.toShort)
    b.putShort(0x0DBB.toShort); b.putShort(0x07CC.toShort)
    b.putInt(0); b.putInt(0)
    rec(0x0809, b.array())
  }

  private val RkIntMin = -(1L << 29)
  private val RkIntMax = (1L << 29) - 1

  /** A cell value the reader will reproduce EXACTLY as this string when
    * written numerically — integers in RK range go to RK/MULRK, other
    * round-tripping numerics to NUMBER, everything else to SST+LABELSST.
    */
  private def asRkInt(s: String): Option[Int] =
    try {
      val v = s.toLong
      if (v >= RkIntMin && v <= RkIntMax && v.toString == s) Some(v.toInt) else None
    } catch { case _: NumberFormatException => None }

  private def asNumber(s: String): Option[Double] =
    try {
      val d = s.toDouble
      if (fmtNum(d) == s) Some(d) else None
    } catch { case _: NumberFormatException => None }

  /** Render rows (first row = header) as a BIFF8 .xls: one sheet, SST
    * strings (CONTINUE-split at `maxRecordData` capacity), numeric cells
    * as RK (single) / MULRK (a row's run of ≥2 consecutive RK ints) /
    * NUMBER. Output parses back identically through [[read]] /
    * [[parseWorkbook]].
    *
    * @param maxRecordData SST record payload capacity — the public
    *   8224-byte BIFF limit by default; specs shrink it to force
    *   mid-string CONTINUE splits.
    */
  def writeWorkbook(rows: Seq[Seq[String]], maxRecordData: Int = 8224,
      dateCols: Set[Int] = Set.empty): Array[Byte] = {
    require(maxRecordData >= 16, "maxRecordData too small for an SST header")
    require(maxRecordData <= 8224, "BIFF8 record payload capacity is 8224 bytes")
    // BIFF8 sheet bounds: 65,536 rows x 256 columns. Unchecked, a larger
    // grid would silently wrap the u16 row/col fields (and a >10,921-cell
    // MULRK run would wrap the u16 record length) into a corrupt stream;
    // within these bounds every record payload fits u16 by construction.
    require(rows.length <= 65536, s"BIFF8 caps sheets at 65536 rows, got ${rows.length}")
    rows.find(_.length > 256).foreach(r =>
      throw new IllegalArgumentException(
        s"BIFF8 caps sheets at 256 columns, got ${r.length}"))
    // date cells (ISO strings in dateCols, header row excluded) become
    // 1900-system serials with ixfe 1 — XF 1 carries the builtin
    // yyyy-mm-dd ifmt below, so the reader's date decode round-trips them
    def dateSerial(r: Int, c: Int, v: String): Option[Double] =
      if (r > 0 && dateCols.contains(c) && v.nonEmpty)
        Some(Xlsx.isoToSerial(v)) else None
    // SST: unique strings in first-appearance order
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var totalRefs = 0
    rows.zipWithIndex.foreach { case (cells, r) =>
      cells.zipWithIndex.foreach { case (v, c) =>
        if (v.nonEmpty && dateSerial(r, c, v).isEmpty &&
          asRkInt(v).isEmpty && asNumber(v).isEmpty) {
          totalRefs += 1
          sstIndex.getOrElseUpdate(v, sstIndex.size): Unit
        }
      }
    }

    // ---- SST record bytes (with CONTINUE splits) ----
    val sstRecords = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    if (sstIndex.nonEmpty) {
      var curBuf = new java.io.ByteArrayOutputStream()
      def le16b(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      def le32b(v: Int): Array[Byte] = le16b(v & 0xFFFF) ++ le16b((v >>> 16) & 0xFFFF)
      var first = true
      def room: Int = maxRecordData - curBuf.size()
      def flush(): Unit = {
        sstRecords += rec(if (first) 0x00FC else 0x003C, curBuf.toByteArray)
        first = false
        curBuf = new java.io.ByteArrayOutputStream()
      }
      curBuf.write(le32b(totalRefs)); curBuf.write(le32b(sstIndex.size))
      sstIndex.keys.foreach { s =>
        val highByte = s.exists(_ > 0xFF)
        val width = if (highByte) 2 else 1
        // header (cch + flags) must not split across records
        if (room < 3 + width) flush()
        curBuf.write(le16b(s.length))
        curBuf.write(if (highByte) 1 else 0)
        var i = 0
        while (i < s.length) {
          if (room < width) {
            // split mid-string: continuation re-declares the flags byte
            flush()
            curBuf.write(if (highByte) 1 else 0)
          }
          val c = s.charAt(i).toInt
          curBuf.write(c & 0xFF)
          if (highByte) curBuf.write((c >> 8) & 0xFF)
          i += 1
        }
      }
      if (curBuf.size() > 0) flush()
    }

    // ---- sheet substream ----
    val sheet = new java.io.ByteArrayOutputStream()
    sheet.write(bof(0x0010))
    def cellHeader(b: java.nio.ByteBuffer, row: Int, colIdx: Int, ixfe: Int = 0): Unit = {
      b.putShort(row.toShort); b.putShort(colIdx.toShort); b.putShort(ixfe.toShort)
    }
    rows.zipWithIndex.foreach { case (cells, r) =>
      var c = 0
      while (c < cells.length) {
        val v = cells(c)
        if (v.isEmpty) c += 1
        else dateSerial(r, c, v) match {
          case Some(serial) =>
            // one cell per record (never MULRK-merged: the run logic
            // assumes a uniform ixfe); whole serials fit RK ints
            if (serial == math.rint(serial) &&
              serial >= RkIntMin && serial <= RkIntMax) {
              val b = java.nio.ByteBuffer.allocate(10)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              cellHeader(b, r, c, ixfe = 1)
              b.putInt((serial.toInt << 2) | 2)
              sheet.write(rec(0x027E, b.array()))
            } else {
              val b = java.nio.ByteBuffer.allocate(14)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              cellHeader(b, r, c, ixfe = 1)
              b.putDouble(serial)
              sheet.write(rec(0x0203, b.array()))
            }
            c += 1
          case None => asRkInt(v) match {
          case Some(iv) =>
            // extend the run of consecutive RK-int cells (same ixfe 0 —
            // date cells never join a run)
            var end = c + 1
            while (end < cells.length && asRkInt(cells(end)).isDefined &&
              dateSerial(r, end, cells(end)).isEmpty) end += 1
            val n = end - c
            if (n >= 2) {
              val b = java.nio.ByteBuffer.allocate(4 + 2 + 6 * n + 2)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              b.putShort(r.toShort); b.putShort(c.toShort)
              (c until end).foreach { cc =>
                b.putShort(0) // ixfe
                b.putInt((asRkInt(cells(cc)).get << 2) | 2)
              }
              b.putShort((end - 1).toShort)
              sheet.write(rec(0x00BD, b.array()))
            } else {
              val b = java.nio.ByteBuffer.allocate(10)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              cellHeader(b, r, c)
              b.putInt((iv << 2) | 2)
              sheet.write(rec(0x027E, b.array()))
            }
            c = end
          case None =>
            asNumber(v) match {
              case Some(d) =>
                val b = java.nio.ByteBuffer.allocate(14)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                cellHeader(b, r, c)
                b.putDouble(d)
                sheet.write(rec(0x0203, b.array()))
              case None =>
                val b = java.nio.ByteBuffer.allocate(10)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                cellHeader(b, r, c)
                b.putInt(sstIndex(v))
                sheet.write(rec(0x00FD, b.array()))
            }
            c += 1
          }
        }
      }
    }
    sheet.write(rec(0x000A, Array.empty))

    // ---- globals substream (sheet offset = globals length, so build the
    // boundsheet with a placeholder, measure, then patch) ----
    val globals = new java.io.ByteArrayOutputStream()
    globals.write(bof(0x0005))
    if (dateCols.nonEmpty) {
      // XF 0 = general, XF 1 = builtin yyyy-mm-dd (ifmt 14): the two
      // style slots the sheet's ixfe values index
      Seq(0, 14).foreach { ifmt =>
        val b = java.nio.ByteBuffer.allocate(20)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putShort(0); b.putShort(ifmt.toShort) // ifnt, ifmt
        globals.write(rec(0x00E0, b.array()))
      }
    }
    sstRecords.foreach(globals.write)
    val name = "Sheet1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val bs = java.nio.ByteBuffer.allocate(4 + 2 + 2 + name.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bs.putInt(0) // lbPlyPos patched below
    bs.putShort(0) // visible worksheet
    bs.put(name.length.toByte); bs.put(0.toByte) // compressed sheet name
    bs.put(name)
    globals.write(rec(0x0085, bs.array()))
    globals.write(rec(0x000A, Array.empty))
    val globalBytes = globals.toByteArray
    val bsPayloadAt = globalBytes.length - (4 + bs.capacity()) - 4 + 4
    val sheetStart = globalBytes.length
    globalBytes(bsPayloadAt) = (sheetStart & 0xFF).toByte
    globalBytes(bsPayloadAt + 1) = ((sheetStart >> 8) & 0xFF).toByte
    globalBytes(bsPayloadAt + 2) = ((sheetStart >> 16) & 0xFF).toByte
    globalBytes(bsPayloadAt + 3) = ((sheetStart >> 24) & 0xFF).toByte

    val wb = globalBytes ++ sheet.toByteArray
    // CFB fixture writer requires >= 4096-byte streams; zero padding reads
    // back as record type 0 and stops every walk cleanly
    val padded =
      if (wb.length >= 4096) wb else java.util.Arrays.copyOf(wb, 4096)
    graft.multimodal.Ole2.writeCfb(Seq("Workbook" -> padded))
  }
}
