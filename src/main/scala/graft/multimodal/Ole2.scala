package graft.multimodal

/** Pure-JVM OLE2 / CFB (Compound File Binary, MS-CFB) container access and
  * legacy-Office text extraction — the real decoder behind the S5 legacy
  * branch the reference routes to MarkItDown (多数据源获取数据.py:1210-1214;
  * this container has no converter, so the engine decodes the formats
  * itself):
  *
  *  - `readStreams`: CFB v3/v4 reader — header, DIFAT→FAT, directory
  *    chain, FAT-chained streams, miniFAT/ministream for small streams.
  *  - `extractPptText`: PowerPoint 97 — record walk of the
  *    "PowerPoint Document" stream (MS-PPT record headers; containers are
  *    recVer 0xF), collecting TextCharsAtom (0x0FA0, UTF-16LE) and
  *    TextBytesAtom (0x0FA8, 8-bit) in document order.
  *  - `extractDocText`: Word 97 — FIB fixed offsets (fcClx at 0x1A2,
  *    table-stream flag bit 0x0200 at 0x000A), CLX piece table in the
  *    0Table/1Table stream, per-piece 8-bit-compressed vs UTF-16 text
  *    from the WordDocument stream (MS-DOC 2.4.1 text retrieval).
  *
  * `writeCfb` is the fixture half (like Xlsx.writeWorkbook /
  * DocumentCodec.writeDeck): a minimal v3 writer, FAT-chained only —
  * callers keep every stream ≥ the 4096-byte mini cutoff.
  */
object Ole2 {

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (bytes(0) & 0xFF) == 0xD0 && (bytes(1) & 0xFF) == 0xCF &&
      (bytes(2) & 0xFF) == 0x11 && (bytes(3) & 0xFF) == 0xE0 &&
      (bytes(4) & 0xFF) == 0xA1 && (bytes(5) & 0xFF) == 0xB1 &&
      (bytes(6) & 0xFF) == 0x1A && (bytes(7) & 0xFF) == 0xE1

  /** All directory streams by name; None on a malformed container. */
  def readStreams(bytes: Array[Byte]): Option[Map[String, Array[Byte]]] = {
    try {
      if (!isCfb(bytes) || bytes.length < 512) return None
      val sectorSize = 1 << le16(bytes, 30)
      val miniSize = 1 << le16(bytes, 32)
      val miniCutoff = le32(bytes, 56)
      def sectorAt(s: Int): Int = sectorSize * (1 + s)

      // FAT: 109 header DIFAT entries + the DIFAT sector chain
      val nFat = le32(bytes, 44)
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109 && fatSectors.length < nFat) {
        val e = le32(bytes, 76 + 4 * i)
        if (e != FreeSect && e != EndOfChain) fatSectors += e
        i += 1
      }
      var difat = le32(bytes, 68)
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < (1 << 16)) {
        val base = sectorAt(difat)
        var j = 0
        while (j < sectorSize / 4 - 1 && fatSectors.length < nFat) {
          val e = le32(bytes, base + 4 * j)
          if (e != FreeSect && e != EndOfChain) fatSectors += e
          j += 1
        }
        difat = le32(bytes, base + sectorSize - 4)
        guard += 1
      }
      val fat = new Array[Int](fatSectors.length * (sectorSize / 4))
      fatSectors.zipWithIndex.foreach { case (s, fi) =>
        val base = sectorAt(s)
        var j = 0
        while (j < sectorSize / 4) {
          fat(fi * (sectorSize / 4) + j) = le32(bytes, base + 4 * j)
          j += 1
        }
      }

      def chain(start: Int, table: Array[Int]): Seq[Int] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var s = start
        var g = 0
        while (s != EndOfChain && s != FreeSect && s >= 0 && g < (1 << 22)) {
          out += s
          if (s >= table.length) return out.toSeq // truncated FAT: stop
          s = table(s)
          g += 1
        }
        out.toSeq
      }

      def readChain(start: Int, size: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        chain(start, fat).foreach { s =>
          val off = sectorAt(s)
          val n = math.min(sectorSize, bytes.length - off)
          if (n > 0) out.write(bytes, off, n)
        }
        val a = out.toByteArray
        java.util.Arrays.copyOf(a, math.min(size, a.length.toLong).toInt)
      }

      // directory entries (linear scan; the red-black tree is irrelevant
      // for extraction)
      val dirBytes = readChain(le32(bytes, 48), Long.MaxValue)
      case class Entry(name: String, typ: Int, start: Int, size: Long)
      val entries = (0 until dirBytes.length / 128).map { k =>
        val b = k * 128
        val nameLen = math.max(0, math.min(64, le16(dirBytes, b + 64)) - 2)
        val name = new String(dirBytes, b, nameLen, "UTF-16LE")
        Entry(name, dirBytes(b + 66) & 0xFF, le32(dirBytes, b + 116),
          le32(dirBytes, b + 120).toLong & 0xFFFFFFFFL)
      }.filter(e => e.typ == 2 || e.typ == 5)

      // ministream (root entry's chain) + miniFAT for sub-cutoff streams
      val root = entries.find(_.typ == 5)
      lazy val miniStream = root.map(r => readChain(r.start, r.size)).getOrElse(Array.emptyByteArray)
      lazy val miniFat: Array[Int] = {
        val mf = readChain(le32(bytes, 60), Long.MaxValue)
        Array.tabulate(mf.length / 4)(j => le32(mf, 4 * j))
      }
      def readMini(start: Int, size: Long): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        chain(start, miniFat).foreach { s =>
          val off = s * miniSize
          val n = math.min(miniSize, miniStream.length - off)
          if (n > 0) out.write(miniStream, off, n)
        }
        val a = out.toByteArray
        java.util.Arrays.copyOf(a, math.min(size, a.length.toLong).toInt)
      }

      Some(entries.filter(_.typ == 2).map { e =>
        e.name -> (if (e.size < miniCutoff) readMini(e.start, e.size)
                   else readChain(e.start, e.size))
      }.toMap)
    } catch { case _: Exception => None }
  }

  // ---- PowerPoint 97 ------------------------------------------------------

  private val TextCharsAtom = 0x0FA0
  private val TextBytesAtom = 0x0FA8

  /** Collect text atoms in record order; container records (recVer 0xF)
    * are descended into. PPT paragraph (\r) and line (0x0B) breaks
    * normalize to \n.
    */
  def extractPptText(bytes: Array[Byte]): Option[String] =
    readStreams(bytes).flatMap(pptTextOf)

  private def pptTextOf(streams: Map[String, Array[Byte]]): Option[String] =
    streams.get("PowerPoint Document").flatMap { doc =>
      val out = new StringBuilder
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val verInst = le16(doc, pos)
          val recType = le16(doc, pos + 2)
          val recLen = le32(doc, pos + 4)
          if (recLen < 0 || pos + 8 + recLen > to) return // malformed: stop
          if ((verInst & 0x0F) == 0x0F) walk(pos + 8, pos + 8 + recLen)
          else if (recType == TextCharsAtom) {
            if (out.nonEmpty) out.append('\n')
            out.append(new String(doc, pos + 8, recLen, "UTF-16LE"))
          } else if (recType == TextBytesAtom) {
            if (out.nonEmpty) out.append('\n')
            out.append(new String(doc, pos + 8, recLen, "windows-1252"))
          }
          pos += 8 + recLen
        }
      }
      walk(0, doc.length)
      val text = out.toString.replace('\r', '\n').replace('\u000B', '\n').trim
      if (text.isEmpty) None else Some(text)
    }

  // ---- Word 97 ------------------------------------------------------------

  /** FIB fixed offsets (MS-DOC): flags at 0x000A (bit 0x0200 selects
    * 1Table), fcClx/lcbClx at 0x01A2/0x01A6; CLX = Prc* then Pcdt (0x02 +
    * lcb + PlcPcd); PCD.fc bit 0x40000000 = 8-bit compressed at fc/2.
    */
  def extractDocText(bytes: Array[Byte]): Option[String] =
    readStreams(bytes).flatMap(docTextOf)

  private def docTextOf(streams: Map[String, Array[Byte]]): Option[String] =
    Some(streams).flatMap { streams =>
      try {
        val wd = streams.getOrElse("WordDocument", return None)
        if (wd.length < 0x01AA || le16(wd, 0) != 0xA5EC) return None
        val tableName = if ((le16(wd, 0x000A) & 0x0200) != 0) "1Table" else "0Table"
        val table = streams.getOrElse(tableName, return None)
        val fcClx = le32(wd, 0x01A2)
        val lcbClx = le32(wd, 0x01A6)
        if (lcbClx <= 0 || fcClx < 0 || fcClx + lcbClx > table.length) return None
        // CLX: skip Prc blocks (0x01 + cb:int16 + data), find Pcdt (0x02)
        var p = fcClx
        val end = fcClx + lcbClx
        while (p < end && (table(p) & 0xFF) == 0x01) p += 3 + le16(table, p + 1)
        if (p >= end || (table(p) & 0xFF) != 0x02) return None
        val lcb = le32(table, p + 1)
        val plc = p + 5
        val k = (lcb - 4) / 12 // n pieces: lcb = 4*(k+1) + 8*k
        if (k <= 0 || plc + lcb > end + 1) return None
        val out = new StringBuilder
        var i = 0
        while (i < k) {
          val cpStart = le32(table, plc + 4 * i)
          val cpEnd = le32(table, plc + 4 * (i + 1))
          val pcd = plc + 4 * (k + 1) + 8 * i
          val fcRaw = le32(table, pcd + 2)
          val chars = cpEnd - cpStart
          if (chars > 0 && chars < (1 << 26)) {
            if ((fcRaw & 0x40000000) != 0) {
              val off = (fcRaw & 0x3FFFFFFF) / 2
              if (off >= 0 && off + chars <= wd.length)
                out.append(new String(wd, off, chars, "windows-1252"))
            } else {
              val off = fcRaw & 0x3FFFFFFF
              if (off >= 0 && off + 2L * chars <= wd.length)
                out.append(new String(wd, off, 2 * chars, "UTF-16LE"))
            }
          }
          i += 1
        }
        // Word control marks: \r paragraph, 0x07 cell, 0x0C page break …
        val text = out.toString.replace('\r', '\n').replace('\u0007', '\n')
          .replace('\u000B', '\n').replace('\f', '\n')
          .filter(c => c == '\n' || c == '\t' || c >= ' ').trim
        if (text.isEmpty) None else Some(text)
      } catch { case _: Exception => None }
    }

  /** Legacy dispatch: PPT if the container holds a PowerPoint stream,
    * DOC for WordDocument, XLS for a BIFF8 `Workbook` stream (rendered as
    * a markdown table, the shape the reference's xlrd fallback feeds its
    * text chain — 多数据源获取数据.py:914-956). The container is parsed
    * ONCE and the streams map threaded through — CFB parsing (DIFAT walk
    * + stream materialization) is the per-row cost here.
    */
  def extractText(bytes: Array[Byte]): Option[String] =
    readStreams(bytes).flatMap { streams =>
      if (streams.contains("PowerPoint Document")) pptTextOf(streams)
      else if (streams.contains("WordDocument")) docTextOf(streams)
      else if (streams.contains("Workbook")) xlsTextOf(streams)
      else None
    }

  private def xlsTextOf(streams: Map[String, Array[Byte]]): Option[String] =
    try {
      streams.get("Workbook")
        .map(wb => graft.sources.Biff.parseBiffStream(wb, Int.MaxValue))
        .filter(_.nonEmpty)
        .map(DocumentCodec.rowsToMdTable)
        .filter(_.trim.nonEmpty)
    } catch { case _: Exception => None }

  // ---- fixture writer -----------------------------------------------------

  /** Minimal CFB v3 writer (FAT chains only): every stream must be ≥ the
    * 4096-byte mini-stream cutoff — fixture builders pad content, keeping
    * the READER's mini path exercised by real-world files, not fixtures.
    */
  def writeCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.forall(_._2.length >= 4096),
      "writeCfb: streams must be >= 4096 bytes (mini-stream not written)")
    val sectorSize = 512
    def sectorsOf(n: Int) = (n + sectorSize - 1) / sectorSize
    val dirEntries = 1 + streams.length
    val nDirSectors = sectorsOf(dirEntries * 128)
    val nDataSectors = streams.map(s => sectorsOf(s._2.length)).sum
    // fixpoint for FAT sector count (FAT covers itself + dir + data)
    var nFat = 1
    var again = true
    while (again) {
      val total = nFat + nDirSectors + nDataSectors
      val need = sectorsOf(total * 4)
      if (need == nFat) again = false else nFat = need
    }
    val totalSectors = nFat + nDirSectors + nDataSectors
    val fat = Array.fill(nFat * sectorSize / 4)(FreeSect)
    var s = 0
    (0 until nFat).foreach { _ => fat(s) = 0xFFFFFFFD; s += 1 } // FATSECT
    val firstDir = s
    (0 until nDirSectors).foreach { j =>
      fat(s) = if (j == nDirSectors - 1) EndOfChain else s + 1; s += 1
    }
    val streamStarts = streams.map { case (_, data) =>
      val start = s
      val n = sectorsOf(data.length)
      (0 until n).foreach { j =>
        fat(s) = if (j == n - 1) EndOfChain else s + 1; s += 1
      }
      start
    }

    val out = java.nio.ByteBuffer.allocate(sectorSize * (1 + totalSectors))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.position(24)
    out.putShort(0x3E.toShort); out.putShort(3); out.putShort(0xFFFE.toShort)
    out.putShort(9); out.putShort(6)
    out.position(44); out.putInt(nFat); out.putInt(firstDir)
    out.position(56); out.putInt(4096); out.putInt(EndOfChain); out.putInt(0)
    out.putInt(EndOfChain); out.putInt(0)
    (0 until 109).foreach(i => out.putInt(76 + 4 * i, if (i < nFat) i else FreeSect))
    // FAT sectors
    out.position(sectorSize)
    fat.foreach(out.putInt)
    // directory
    def dirEntry(name: String, typ: Int, color: Int, left: Int, right: Int,
        child: Int, start: Int, size: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nm = name.getBytes("UTF-16LE")
      b.put(nm, 0, math.min(nm.length, 62))
      b.position(64); b.putShort((math.min(nm.length, 62) + 2).toShort)
      b.put(typ.toByte); b.put(color.toByte)
      b.putInt(left); b.putInt(right); b.putInt(child)
      b.position(116); b.putInt(start); b.putInt(size)
      b.array()
    }
    val dirStart = sectorSize * (1 + firstDir)
    out.position(dirStart)
    out.put(dirEntry("Root Entry", 5, 1, -1, -1,
      if (streams.nonEmpty) 1 else -1, EndOfChain, 0))
    streams.zipWithIndex.foreach { case ((name, data), i) =>
      // degenerate right-leaning sibling chain — linear readers don't care
      val right = if (i < streams.length - 1) i + 2 else -1
      out.put(dirEntry(name, 2, 1, -1, right, -1, streamStarts(i), data.length))
    }
    // stream data
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      out.position(sectorSize * (1 + streamStarts(i)))
      out.put(data)
    }
    out.array()
  }
}
