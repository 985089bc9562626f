package graft

import graft.sources.{XlsxFormat, XlsxSource}
import graft.sinks.XlsxSink
import java.nio.file.Files

/** xlsx write→read roundtrips per the reference's `t/File.t:27-38, 55-80`
  * (FIXTURES.md §3): sheet selection by name/id, positional headerColumns,
  * mismatch failure, date columns, stopOnEmptyValueColumn. */
class XlsxRoundtripSpec extends SparkSpec {

  private def out(name: String): String =
    Files.createTempDirectory("graft-xlsx-").resolve(name).toString

  private def writeSample(): String = {
    import spark.implicits._
    val df = Seq(("val11", "val21", "val31"), ("val12", "val22", "val32"))
      .toDF("col1", "col2", "col3")
    val p = out("t.xlsx")
    XlsxSink.write(df, Seq("col1", "col2", "col3"), p)
    p
  }

  test("roundtrip by worksheet id (t/File.t:27-33)") {
    val p = writeSample()
    val fmt = XlsxFormat(header = Seq("col1", "col2", "col3"), worksheetId = Some(1))
    val rows = XlsxSource.read(spark, Seq(p), fmt).orderBy("_lineno")
      .select("col1", "col2", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("val11", "val21", "val31"), Seq("val12", "val22", "val32")))
  }

  test("roundtrip by worksheet name (Wrap/File.pm:299-308)") {
    import spark.implicits._
    val df = Seq(("a", "b")).toDF("c1", "c2")
    val p = out("named.xlsx")
    XlsxSink.write(df, Seq("c1", "c2"), p, sheetName = "mysheet")
    val fmt = XlsxFormat(header = Seq("c1", "c2"), worksheet = Some("mysheet"))
    assert(XlsxSource.read(spark, Seq(p), fmt).count() == 1)
    val bad = XlsxFormat(header = Seq("c1", "c2"), worksheet = Some("nope"))
    val ex = intercept[Exception] {
      XlsxSource.read(spark, Seq(p), bad).collect()
    }
    assert(ex.getMessage.contains("no worksheet named") ||
      Option(ex.getCause).exists(_.getMessage.contains("no worksheet named")))
  }

  test("positional headerColumns selection (t/File.t:69-73)") {
    val p = writeSample()
    val fmt = XlsxFormat(header = Seq("col1", "col3"), headerColumns = Seq(1, 3),
      worksheetId = Some(1))
    val rows = XlsxSource.read(spark, Seq(p), fmt).orderBy("_lineno")
      .select("col1", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("val11", "val31"), Seq("val12", "val32")))
  }

  test("headerColumns length mismatch errors out (t/File.t:76-80)") {
    intercept[IllegalArgumentException] {
      XlsxSource.read(spark, Seq("/nonexistent.xlsx"),
        XlsxFormat(header = Seq("col1", "col2", "col3"), headerColumns = Seq(1, 3),
          worksheetId = Some(1)))
    }
  }

  test("header text mismatch fails the read (Wrap/File.pm:198-200)") {
    val p = writeSample()
    val fmt = XlsxFormat(header = Seq("colX", "col2", "col3"), worksheetId = Some(1))
    val ex = intercept[Exception] { XlsxSource.read(spark, Seq(p), fmt).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("expected header")))
  }

  test("date columns: Excel serial → YYYYMMDD (Wrap/File.pm:207-210)") {
    import spark.implicits._
    // serial 45292 = 2024-01-01
    val df = Seq(("45292", "x")).toDF("d", "v")
    val p = out("dates.xlsx")
    XlsxSink.write(df, Seq("d", "v"), p)
    val fmt = XlsxFormat(header = Seq("d", "v"), worksheetId = Some(1),
      dateColumns = Seq(1))
    val rows = XlsxSource.read(spark, Seq(p), fmt).select("d", "v").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("20240101", "x")))
  }

  test("stopOnEmptyValueColumn truncation (Wrap/File.pm:167-169)") {
    import spark.implicits._
    val df = Seq(("v1", "a"), ("", "b"), ("v3", "c")).toDF("k", "v")
    val p = out("stop.xlsx")
    XlsxSink.write(df, Seq("k", "v"), p)
    val fmt = XlsxFormat(header = Seq("k", "v"), worksheetId = Some(1),
      stopOnEmptyValueColumn = Some(1))
    val rows = XlsxSource.read(spark, Seq(p), fmt).select("k", "v").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("v1", "a")))
  }
}
