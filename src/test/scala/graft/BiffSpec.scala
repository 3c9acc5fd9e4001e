package graft

import graft.multimodal.{DocumentCodec, Ole2}
import graft.sources.Biff
import org.scalatest.funsuite.AnyFunSuite

/** S4 legacy half — BIFF8 (.xls) decode. Fixtures are built through
  * [[Biff.writeWorkbook]] (real CFB container + BIFF records), so every
  * test certifies the write→CFB→record-walk→SST→cell round trip; the
  * adversarial cases shrink the SST record capacity to force CONTINUE
  * splits, including mid-string splits where the continuation re-declares
  * the compressed/UTF-16 flag byte.
  */
class BiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val rows = Seq(
    Seq("c_custkey", "c_name", "c_mktsegment"),
    Seq("1", "Customer#000000001", "BUILDING"),
    Seq("2", "客户#二", "AUTOMOBILE"),
    Seq("3", "Customer#000000003", "机械与设备"))

  test("round trip: SST strings, RK ints, CJK, ragged rows") {
    val parsed = Biff.parseWorkbook(Biff.writeWorkbook(rows), 100)
    assert(parsed == rows)
  }

  test("numeric record selection: RK single, MULRK runs, NUMBER doubles") {
    val numeric = Seq(
      Seq("id", "a", "b", "c", "d"),
      // run of 4 consecutive RK ints → one MULRK
      Seq("10", "11", "12", "13", "x"),
      // single RK between strings, a double → NUMBER, a negative int
      Seq("s", "7", "3.25", "-536870912", "t"),
      // RK-int range edges and beyond (2^29-1 fits, 2^29 must go NUMBER)
      Seq("536870911", "536870912", "1.5E20", "0.01", "y"))
    val bytes = Biff.writeWorkbook(numeric)
    assert(Biff.parseWorkbook(bytes, 100) == numeric)
    // record-type audit on the raw stream: MULRK + NUMBER + RK all present
    val wb = Ole2.readStreams(bytes).get("Workbook")
    def count(recType: Int): Int = {
      var p = 0; var n = 0
      while (p + 4 <= wb.length) {
        val t = (wb(p) & 0xFF) | ((wb(p + 1) & 0xFF) << 8)
        val len = (wb(p + 2) & 0xFF) | ((wb(p + 3) & 0xFF) << 8)
        if (t == recType) n += 1
        p += 4 + len
      }
      n
    }
    assert(count(0x00BD) == 1, "one MULRK for the one >=2 consecutive-int run")
    assert(count(0x0203) >= 3, "doubles and out-of-RK-range ints go NUMBER")
    assert(count(0x027E) >= 3, "isolated ints go RK")
  }

  test("RK decode: int, int/100, double, double/100 forms") {
    assert(Biff.rkValue((42 << 2) | 2) == 42.0)
    assert(Biff.rkValue((4250 << 2) | 3) == 42.5) // int with /100
    val bits = java.lang.Double.doubleToLongBits(1.5) // low 34 bits zero
    val rkDouble = ((bits >>> 32) & 0xFFFFFFFCL).toInt
    assert(Biff.rkValue(rkDouble) == 1.5)
    assert(Biff.rkValue(rkDouble | 1) == 0.015)
  }

  test("SST CONTINUE: mid-string splits re-declare the flag byte") {
    // long strings + a tiny record capacity force many CONTINUE records
    // with both compressed (ASCII) and UTF-16 (CJK) strings split mid-way
    val long1 = "alpha-" * 20 + "end"
    val long2 = "汉字串" * 15
    val long3 = "mixed" + "值" * 10 + "tail"
    val data = Seq(Seq("h1", "h2", "h3"), Seq(long1, long2, long3))
    val bytes = Biff.writeWorkbook(data, maxRecordData = 32)
    val wb = Ole2.readStreams(bytes).get("Workbook")
    var p = 0; var continues = 0
    while (p + 4 <= wb.length) {
      val t = (wb(p) & 0xFF) | ((wb(p + 1) & 0xFF) << 8)
      val len = (wb(p + 2) & 0xFF) | ((wb(p + 3) & 0xFF) << 8)
      if (t == 0x003C) continues += 1
      p += 4 + len
    }
    assert(continues >= 5, s"expected many CONTINUE records, got $continues")
    assert(Biff.parseWorkbook(bytes, 100) == data)
  }

  test("header-at-record-boundary: string header never splits") {
    // capacities swept across the alignment space so SOME layout lands a
    // string header exactly at each record's end
    (17 to 48).foreach { cap =>
      val data = Seq(Seq("k", "v"), Seq("aaaa", "bbbbb"), Seq("漢漢漢", "cc"))
      assert(Biff.parseWorkbook(Biff.writeWorkbook(data, maxRecordData = cap), 100)
        == data, s"capacity $cap")
    }
  }

  test("maxRows caps the walk; garbage and truncated payloads yield empty") {
    val parsed = Biff.parseWorkbook(Biff.writeWorkbook(rows), 2)
    assert(parsed == rows.take(2))
    assert(Biff.parseWorkbook(Array[Byte](1, 2, 3), 10).isEmpty)
    assert(Biff.parseWorkbook(Array.empty[Byte], 10).isEmpty)
    val truncated = Biff.writeWorkbook(rows).take(700)
    assert(Biff.parseWorkbook(truncated, 10).isEmpty) // CFB walk rejects
  }

  test("writeWorkbook enforces BIFF8 sheet bounds instead of wrapping u16 fields") {
    intercept[IllegalArgumentException] {
      Biff.writeWorkbook(Seq(Seq.fill(257)("x")))
    }
    intercept[IllegalArgumentException] {
      Biff.writeWorkbook(rows, maxRecordData = 9000)
    }
  }

  test("DocumentCodec.parse renders .xls as a markdown table") {
    val md = DocumentCodec.parse(Biff.writeWorkbook(rows), ".xls")
    assert(md.contains("| c_custkey | c_name | c_mktsegment |"))
    assert(md.contains("| 2 | 客户#二 | AUTOMOBILE |"))
    // magic-number sniff rescues a misnamed .xls too
    val sniffed = DocumentCodec.parse(Biff.writeWorkbook(rows), ".bin")
    assert(sniffed.contains("| c_custkey | c_name | c_mktsegment |"))
  }

  test("Biff.read: distributed scan with header-derived schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_biff").toString
    try {
      Seq(0, 1).foreach { parity =>
        val data = rows.head +: rows.tail.filter(_.head.toLong % 2 == parity)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"part_$parity.xls"),
          Biff.writeWorkbook(data)): Unit
      }
      val df = Biff.read(spark, s"$dir/*.xls")
      assert(df.columns.toSeq == Seq("c_custkey", "c_name", "c_mktsegment"))
      val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(got == rows.tail.map(r => (r(0), r(1), r(2))).toSet)
    } finally {
      new java.io.File(dir).listFiles().foreach(_.delete())
      new java.io.File(dir).delete(): Unit
    }
  }

  test("dateCols round-trip: serials + XF date formats decode to ISO") {
    val data = Seq(
      Seq("id", "event_date", "event_ts", "plain"),
      // whole serial -> RK path; fractional -> NUMBER path; the plain
      // numeric column must stay numeric (ixfe 0 never decodes as date)
      Seq("1", "2024-01-01", "2024-01-01 06:00:00", "45292"),
      Seq("2", "2020-02-29", "1999-12-31 23:59:59", "7"))
    val bytes = Biff.writeWorkbook(data, dateCols = Set(1, 2))
    assert(Biff.parseWorkbook(bytes, 10) == data)
  }
}
