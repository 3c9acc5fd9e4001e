package graft

import graft.multimodal.{DocumentCodec, Ole2}
import org.scalatest.funsuite.AnyFunSuite

/** CFB container round-trips + legacy Word-97/PowerPoint-97 extraction.
  * Fixtures are assembled from raw format bytes (MS-CFB sector layout,
  * MS-PPT record headers, MS-DOC FIB/CLX piece table) like the PDF/DOCX/
  * PPTX golden fixtures — no external tooling involved.
  */
class Ole2Spec extends AnyFunSuite {

  private def le = java.nio.ByteOrder.LITTLE_ENDIAN

  private def pptRecord(verInst: Int, typ: Int, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length).order(le)
    b.putShort(verInst.toShort); b.putShort(typ.toShort); b.putInt(payload.length)
    b.put(payload)
    b.array()
  }

  /** PowerPoint Document stream: a container holding one UTF-16 text atom
    * and one 8-bit text atom, plus a zero-type padding record that lifts
    * the stream over the 4096-byte mini cutoff.
    */
  private def pptDocStream: Array[Byte] = {
    val chars = pptRecord(0x0000, 0x0FA0, "标题 Slide 标题".getBytes("UTF-16LE"))
    val bytes = pptRecord(0x0000, 0x0FA8,
      "Hello legacy\rworldsecond line".getBytes("windows-1252"))
    val container = pptRecord(0x000F, 0x03EE, chars ++ bytes)
    val pad = pptRecord(0x0000, 0x0000, new Array[Byte](4200))
    container ++ pad
  }

  /** WordDocument + 1Table streams: two text pieces — UTF-16 Chinese then
    * fc-compressed (8-bit) ASCII — addressed by a CLX piece table that is
    * preceded by a Prc block the parser must skip.
    */
  private def docStreams: (Array[Byte], Array[Byte]) = {
    val wd = java.nio.ByteBuffer.allocate(8192).order(le)
    wd.putShort(0, 0xA5EC.toShort)            // wIdent
    wd.putShort(0x000A, 0x0200.toShort)       // fWhichTblStm → 1Table
    val uni = "中文内容测试".getBytes("UTF-16LE")  // 6 chars
    val ansi = "ASCII tail.".getBytes("windows-1252") // 11 chars
    wd.position(0x800); wd.put(uni)
    wd.position(0x900); wd.put(ansi)
    val fcClx = 0x40
    wd.putInt(0x01A2, fcClx)
    val table = java.nio.ByteBuffer.allocate(4608).order(le)
    table.position(fcClx)
    table.put(0x01.toByte); table.putShort(4.toShort)
    table.putInt(0xDEADBEEF)                  // Prc to skip
    table.put(0x02.toByte)                    // Pcdt
    table.putInt(4 * 3 + 8 * 2)               // lcb for k=2 pieces
    table.putInt(0); table.putInt(6); table.putInt(17)  // cps
    table.putShort(0); table.putInt(0x800); table.putShort(0)           // PCD 1: UTF-16 at 0x800
    table.putShort(0); table.putInt(0x40000000 | (0x900 * 2)); table.putShort(0) // PCD 2: 8-bit
    wd.putInt(0x01A6, table.position() - fcClx) // lcbClx
    (wd.array(), table.array())
  }

  test("CFB writer/reader round-trip preserves streams and sizes") {
    val a = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    val b = Array.tabulate[Byte](4096)(i => (i % 13).toByte)
    val cfb = Ole2.writeCfb(Seq("StreamA" -> a, "StreamB" -> b))
    assert(Ole2.isCfb(cfb))
    val streams = Ole2.readStreams(cfb).get
    assert(streams.keySet == Set("StreamA", "StreamB"))
    assert(java.util.Arrays.equals(streams("StreamA"), a))
    assert(java.util.Arrays.equals(streams("StreamB"), b))
  }

  test("readStreams refuses malformed containers") {
    assert(Ole2.readStreams("junk".getBytes).isEmpty)
    assert(Ole2.readStreams(new Array[Byte](600)).isEmpty) // no magic
  }

  test("PowerPoint 97: text atoms extracted in order, breaks normalized") {
    val ppt = Ole2.writeCfb(Seq("PowerPoint Document" -> pptDocStream))
    val got = Ole2.extractPptText(ppt).get
    assert(got == "标题 Slide 标题\nHello legacy\nworld\nsecond line")
    // generic entry points agree
    assert(Ole2.extractText(ppt).contains(got))
    assert(DocumentCodec.detectFormat(ppt) == DocumentCodec.LegacyOffice)
    assert(DocumentCodec.extractText(ppt).contains(got))
  }

  test("Word 97: piece table drives UTF-16 + compressed extraction") {
    val (wd, table) = docStreams
    val doc = Ole2.writeCfb(Seq("WordDocument" -> wd, "1Table" -> table))
    val got = Ole2.extractDocText(doc).get
    assert(got == "中文内容测试ASCII tail.")
    assert(DocumentCodec.parse(doc, ".doc") == "中文内容测试ASCII tail.")
  }

  test("parse: real legacy decode beats the converter seam; empty falls back") {
    val ppt = Ole2.writeCfb(Seq("PowerPoint Document" -> pptDocStream))
    var called = false
    val out = DocumentCodec.parse(ppt, ".ppt",
      fallback = (_, _) => { called = true; Some("converted") })
    assert(out.startsWith("标题 Slide"))
    assert(!called)
    // a CFB with no extractable text still reaches the converter
    val empty = Ole2.writeCfb(Seq("SomeOther" -> new Array[Byte](4096)))
    assert(DocumentCodec.parse(empty, ".ppt",
      fallback = (_, _) => Some("converted")) == "converted")
  }
}
