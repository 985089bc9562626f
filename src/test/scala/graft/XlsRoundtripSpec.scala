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
