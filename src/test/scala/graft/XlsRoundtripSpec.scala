package graft

import graft.sinks.XlsSink
import graft.sources.{XlsSource, XlsxFormat}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** S3 legacy-xls conformance, t/File.t:27-38 shape: roundtrip through the
  * BIFF8 writer/reader, header verification, sheet addressing, positional
  * columns, date serials, stopOnEmptyValueColumn, and a hand-crafted
  * SST+CONTINUE workbook for the shared-string path the writer doesn't
  * emit. */
class XlsRoundtripSpec extends SparkSpec {
  import spark.implicits._

  private def tmpXls(name: String): String =
    Files.createTempDirectory("graft-xls-").resolve(name).toString

  test("CfbFile follows a non-sequential mini-FAT chain for small streams") {
    // Hand-built minimal CFB: 512-byte sectors, 64-byte mini sectors.
    // Sector map: 0=FAT, 1=directory, 2=mini-FAT, 3=mini stream.
    // Stream "Small" is 100 bytes < the 4096 cutoff, stored in the mini
    // stream with chain mini-sector 1 → 0 (deliberately out of order, so a
    // sequential read would produce the wrong bytes).
    val EOC = 0xFFFFFFFE
    val FREE = 0xFFFFFFFF
    val bytes = new Array[Byte](512 * 5)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // header
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).zipWithIndex
      .foreach { case (v, i) => bytes(i) = v.toByte }
    bb.putShort(28, 0xFFFE.toShort) // little-endian marker
    bb.putShort(30, 9)              // 512-byte sectors
    bb.putShort(32, 6)              // 64-byte mini sectors
    bb.putInt(44, 1)                // 1 FAT sector
    bb.putInt(48, 1)                // directory at sector 1
    bb.putInt(56, 4096)             // mini-stream cutoff
    bb.putInt(60, 2)                // mini-FAT at sector 2
    bb.putInt(64, 1)                // 1 mini-FAT sector
    bb.putInt(68, EOC)              // no chained DIFAT
    bb.putInt(72, 0)
    bb.putInt(76, 0)                // DIFAT[0]: FAT at sector 0
    (1 until 109).foreach(i => bb.putInt(76 + i * 4, FREE))
    // FAT (sector 0): 0=FAT marker, 1=dir end, 2=minifat end, 3=ministream end
    val fatBase = 512
    bb.putInt(fatBase, 0xFFFFFFFD)
    bb.putInt(fatBase + 4, EOC)
    bb.putInt(fatBase + 8, EOC)
    bb.putInt(fatBase + 12, EOC)
    (4 until 128).foreach(i => bb.putInt(fatBase + i * 4, FREE))
    // directory (sector 1): entry 0 = Root (type 5, owns the mini stream),
    // entry 1 = "Small" (type 2, start mini-sector 1, 100 bytes)
    def dirEntry(idx: Int, name: String, objType: Int, start: Int, size: Long): Unit = {
      val base = 512 * 2 + idx * 128
      val utf16 = name.getBytes("UTF-16LE")
      System.arraycopy(utf16, 0, bytes, base, utf16.length)
      bb.putShort(base + 64, (utf16.length + 2).toShort)
      bytes(base + 66) = objType.toByte
      bb.putInt(base + 116, start)
      bb.putLong(base + 120, size)
    }
    dirEntry(0, "Root Entry", 5, 3, 128)
    dirEntry(1, "Small", 2, 1, 100)
    // mini-FAT (sector 2): chain 1 → 0 → end
    bb.putInt(512 * 3, EOC)     // miniFat(0) = end
    bb.putInt(512 * 3 + 4, 0)   // miniFat(1) = 0
    (2 until 128).foreach(i => bb.putInt(512 * 3 + i * 4, FREE))
    // mini stream (sector 3): mini-sector 0 holds the TAIL, 1 holds the HEAD
    (0 until 64).foreach(i => bytes(512 * 4 + i) = 'T'.toByte)
    (0 until 64).foreach(i => bytes(512 * 4 + 64 + i) = 'H'.toByte)

    val parsed = graft.sources.CfbFile.parse(bytes)
    assert(parsed.entries.map(_.name) == Seq("Small"))
    val got = parsed.stream("Small").get
    assert(got.length == 100) // exact entry size, not padded sector length
    assert(got.take(64).forall(_ == 'H'.toByte), "head must come from mini-sector 1")
    assert(got.drop(64).forall(_ == 'T'.toByte), "tail must follow the chain to mini-sector 0")
  }

  test("cyclic FAT chain terminates instead of hanging") {
    // reuse the mini-FAT fixture layout but corrupt the directory chain
    // into a self-loop: fat(1) = 1
    val EOC = 0xFFFFFFFE
    val bytes = new Array[Byte](512 * 3)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).zipWithIndex
      .foreach { case (v, i) => bytes(i) = v.toByte }
    bb.putShort(30, 9).putShort(32, 6)
    bb.putInt(48, 1)  // directory at sector 1
    bb.putInt(56, 4096)
    bb.putInt(60, EOC); bb.putInt(64, 0) // no mini-FAT
    bb.putInt(68, EOC); bb.putInt(72, 0)
    bb.putInt(76, 0) // FAT at sector 0
    (1 until 109).foreach(i => bb.putInt(76 + i * 4, 0xFFFFFFFF))
    bb.putInt(512, 0xFFFFFFFD)
    bb.putInt(512 + 4, 1) // fat(1) = 1 → cycle
    // must terminate (bounded walk); entries may be garbage or empty
    val parsed = graft.sources.CfbFile.parse(bytes)
    assert(parsed.entries.length >= 0)
  }

  test("write/read roundtrip with mixed label and number cells") {
    val df = Seq(("val11", "21", "3.5"), ("val12", "22", "-0.25"),
                 ("Ümläut", "23", "1e-3"))
      .toDF("col1", "col2", "col3")
    val f = tmpXls("basic.xls")
    XlsSink.write(df, Seq("col1", "col2", "col3"), f)
    val fmt = XlsxFormat(header = Seq("col1", "col2", "col3"), worksheetId = Some(1))
    val rows = XlsSource.read(spark, Seq(f), fmt).orderBy("_lineno")
      .select("col1", "col2", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("val11", "21", "3.5"), Seq("val12", "22", "-0.25"),
      Seq("Ümläut", "23", "0.001"))) // 1e-3 written as NUMBER → canonical text
  }

  test("cell beyond the BIFF8 record cap fails loudly, not corruptly") {
    // 8224 data bytes is the BIFF8 record-body cap; past ~32 KiB the
    // length field's toShort would wrap negative and emit an unreadable
    // workbook — the writer must reject it instead
    val df = Seq(("x" * 9000, "1")).toDF("big", "n")
    val e = intercept[IllegalArgumentException] {
      XlsSink.write(df, Seq("big", "n"), tmpXls("toolong.xls"))
    }
    assert(e.getMessage.contains("8224"))
  }

  test("worksheet addressable by name; wrong name/header fail loudly") {
    val df = Seq(("a", "1")).toDF("x", "y")
    val f = tmpXls("named.xls")
    XlsSink.write(df, Seq("x", "y"), f, sheetName = "datasheet")
    val byName = XlsSource.read(spark, Seq(f),
      XlsxFormat(header = Seq("x", "y"), worksheet = Some("datasheet")))
    assert(byName.count() == 1)
    val err = intercept[org.apache.spark.SparkException] {
      XlsSource.read(spark, Seq(f),
        XlsxFormat(header = Seq("x", "y"), worksheet = Some("nope"))).collect()
    }
    assert(err.getMessage.contains("no worksheet named") ||
      Option(err.getCause).exists(_.getMessage.contains("no worksheet named")))
    val hdr = intercept[org.apache.spark.SparkException] {
      XlsSource.read(spark, Seq(f),
        XlsxFormat(header = Seq("x", "WRONG"), worksheet = Some("datasheet"))).collect()
    }
    assert(hdr.getMessage.contains("expected header") ||
      Option(hdr.getCause).exists(_.getMessage.contains("expected header")))
  }

  test("headerColumns positional selection + date serial conversion") {
    // physical columns: name, serial-date, ignored, qty — pick 1,2,4
    val df = Seq(("widget", "2", "junk", "10"), ("gadget", "45000", "junk", "20"))
      .toDF("name", "d", "skip", "qty")
    val f = tmpXls("pos.xls")
    XlsSink.write(df, Seq("name", "d", "skip", "qty"), f)
    val fmt = XlsxFormat(header = Seq("name", "d", "qty"),
      targetHeader = Seq("item", "date_ymd", "quantity"),
      headerColumns = Seq(1, 2, 4), dateColumns = Seq(2), worksheetId = Some(1))
    val rows = XlsSource.read(spark, Seq(f), fmt).orderBy("_lineno")
      .select("item", "date_ymd", "quantity").collect().map(_.toSeq)
    // serial 2 = 1900-01-01, serial 45000 = 2023-03-15 (1899-12-30 epoch)
    assert(rows.toSeq == Seq(Seq("widget", "19000101", "10"),
                             Seq("gadget", "20230315", "20")))
  }

  test("stopOnEmptyValueColumn truncates from first empty cell") {
    val df = Seq(("r1", "a"), ("r2", null), ("r3", "c")).toDF("k", "v")
    val f = tmpXls("stop.xls")
    XlsSink.write(df, Seq("k", "v"), f)
    val fmt = XlsxFormat(header = Seq("k", "v"), worksheetId = Some(1),
      stopOnEmptyValueColumn = Some(2))
    val rows = XlsSource.read(spark, Seq(f), fmt)
      .select("k").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("r1")) // r2 empty → r2, r3 dropped
  }

  test("SST + CONTINUE shared strings parse (LABELSST path)") {
    // hand-build a workbook whose SST splits a string across CONTINUE,
    // re-stating the compression flag at the continuation boundary
    def rec(typ: Int, data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(typ.toShort).putShort(data.length.toShort).put(data)
      b.array()
    }
    def u16(v: Int): Array[Byte] =
      ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def u32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

    val bofG = rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ u16(0x0DBB) ++ u16(0x07CC) ++ u32(0) ++ u32(6))
    val bofS = rec(0x0809, u16(0x0600) ++ u16(0x0010) ++ u16(0x0DBB) ++ u16(0x07CC) ++ u32(0) ++ u32(6))
    val eofR = rec(0x000A, Array.empty[Byte])
    // SST: 2 refs, 2 unique: "hello" fully in SST; "worldwide" split after "wor"
    val s1 = "hello".getBytes("ISO-8859-1")
    val sstData = u32(2) ++ u32(2) ++
      u16(5) ++ Array(0.toByte) ++ s1 ++
      u16(9) ++ Array(0.toByte) ++ "wor".getBytes("ISO-8859-1")
    val contData = Array(0.toByte) ++ "ldwide".getBytes("ISO-8859-1") // flag re-stated
    val sst = rec(0x00FC, sstData) ++ rec(0x003C, contData)
    // header row uses LABELSST too: header "h" → need 3rd string… simpler:
    // header via LABEL record, data via LABELSST
    def labelsst(row0: Int, col0: Int, isst: Int): Array[Byte] =
      rec(0x00FD, u16(row0) ++ u16(col0) ++ u16(15) ++ u32(isst))
    def label(row0: Int, col0: Int, s: String): Array[Byte] =
      rec(0x0204, u16(row0) ++ u16(col0) ++ u16(15) ++ u16(s.length) ++
        Array(0.toByte) ++ s.getBytes("ISO-8859-1"))

    val sheet = bofS ++ label(0, 0, "w1") ++ label(0, 1, "w2") ++
      labelsst(1, 0, 0) ++ labelsst(1, 1, 1) ++ eofR
    val globalsPrefix = bofG
    // BOUNDSHEET length depends only on the name → compute offset
    val bsLen = rec(0x0085, u32(0) ++ u16(0) ++ Array(2.toByte, 0.toByte) ++
      "S1".getBytes("ISO-8859-1")).length
    val offset = globalsPrefix.length + bsLen + sst.length + eofR.length
    val boundsheet = rec(0x0085, u32(offset) ++ u16(0) ++
      Array(2.toByte, 0.toByte) ++ "S1".getBytes("ISO-8859-1"))
    val stream = globalsPrefix ++ boundsheet ++ sst ++ eofR ++ sheet

    val f = tmpXls("sst.xls")
    Files.write(java.nio.file.Paths.get(f), XlsSink.cfbWrap(stream))
    val rows = XlsSource.read(spark, Seq(f),
        XlsxFormat(header = Seq("w1", "w2"), worksheetId = Some(1)))
      .select("w1", "w2").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("hello", "worldwide")))
  }
}
