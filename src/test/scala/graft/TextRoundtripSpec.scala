package graft

import graft.sources.{TextFormat, TextSource}
import graft.sinks.{TextSink, TextWriteFormat}
import java.nio.file.{Files, Paths}
import java.nio.charset.Charset

/** Write→read-back roundtrips per format, mirroring the reference's
  * `t/File.t` (FIXTURES.md §1-2) plus fixed-width, skip modes, cp1252 and
  * CRLF-records with embedded LFs. */
class TextRoundtripSpec extends SparkSpec {

  private def tmp(name: String, content: String, cs: String = "UTF-8"): String = {
    val d = Files.createTempDirectory("graft-text-test-")
    val p = d.resolve(name)
    Files.write(p, content.getBytes(Charset.forName(cs)))
    p.toString
  }

  private def readAll(path: String, fmt: TextFormat) =
    TextSource.read(spark, Seq(path), fmt)

  test("tab-separated with header skip (FIXTURES §1 / t/File.t:13-17)") {
    val f = tmp("tab.txt", "col1\tcol2\tcol3\nval11\tval21\tval31\nval12\tval22\tval32\n")
    val fmt = TextFormat(header = Seq("col1", "col2", "col3"), sep = "\t", skip = 1)
    val rows = readAll(f, fmt).orderBy("_lineno")
      .select("col1", "col2", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("val11", "val21", "val31"), Seq("val12", "val22", "val32")))
  }

  test("quoted CSV with space in header/values (FIXTURES §2 / t/File.t:20-24)") {
    val f = tmp("q.csv", "\"col 1\",col2,col3\n\"val 11\",val21,val31\n\"val 12\",val22,val32\n")
    val fmt = TextFormat(header = Seq("col 1", "col2", "col3"), sep = ",",
      quoted = true, skip = 1)
    val rows = readAll(f, fmt).orderBy("_lineno")
      .select("col 1", "col2", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("val 11", "val21", "val31"), Seq("val 12", "val22", "val32")))
  }

  test("fixed-width poslen (start,end) slicing (Wrap/File.pm:110-114)") {
    val f = tmp("fix.txt", "AAABBBB\nCCCDDDD\n")
    val fmt = TextFormat(header = Seq("a", "b"), poslen = Seq((0, 3), (3, 7)),
      normalizeNumerics = false)
    val rows = readAll(f, fmt).orderBy("_lineno").select("a", "b").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("AAA", "BBBB"), Seq("CCC", "DDDD")))
  }

  test("skip-until-regex inclusive (Wrap/File.pm:84-96)") {
    val f = tmp("rep.txt", "garbage\nreport as of 2024\nHEADER\nv1\tv2\nv3\tv4\n")
    val fmt = TextFormat(header = Seq("a", "b"), sep = "\t", skipUntil = Some("HEADER"))
    val rows = readAll(f, fmt).orderBy("_lineno").select("a", "b").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("v1", "v2"), Seq("v3", "v4")))
  }

  test("rename to targetheader; empty lines and empty first field dropped") {
    val f = tmp("t.txt", "x\ty\n\n\tz\nv1\tv2\n")
    val fmt = TextFormat(header = Seq("x", "y"), targetHeader = Seq("tx", "ty"),
      sep = "\t", skip = 1)
    val df = readAll(f, fmt)
    assert(df.columns.toSeq == Seq("_file", "_lineno", "tx", "ty"))
    val rows = df.select("tx", "ty").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("v1", "v2"))) // "\tz" row dropped (empty first field)
  }

  test("normalizeNumerics applied per field with configured separators") {
    val f = tmp("n.txt", "num\n22.123.123,013\nabc\n")
    val fmt = TextFormat(header = Seq("num"), sep = "\t", skip = 1,
      thousandSep = ".", decimalSep = ",")
    val rows = readAll(f, fmt).orderBy("_lineno").select("num").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("22123123.013", "abc"))
  }

  test("cp1252 encoding (Wrap/File.pm:79)") {
    val f = tmp("enc.txt", "name\nMärz\n", "windows-1252")
    val fmt = TextFormat(header = Seq("name"), sep = "\t", skip = 1,
      encoding = "windows-1252")
    val rows = readAll(f, fmt).select("name").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("März"))
  }

  test("CRLF records with embedded LF in data (format_allowLinefeedInData)") {
    val f = tmp("crlf.txt", "a\tb\r\nv1 line1\nline2\tv2\r\nv3\tv4\r\n")
    val fmt = TextFormat(header = Seq("a", "b"), sep = "\t", skip = 1,
      allowLinefeedInData = true, normalizeNumerics = false)
    val rows = readAll(f, fmt).orderBy("_lineno").select("a", "b").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(Seq("v1 line1\nline2", "v2"), Seq("v3", "v4")))
  }

  test("write→read roundtrip: tab text (t/File.t:41-45)") {
    import spark.implicits._
    val df = Seq(("val11", "val21", "val31"), ("val12", "val22", "val32"))
      .toDF("col1", "col2", "col3")
    val out = Files.createTempDirectory("graft-out-").resolve("out.txt").toString
    TextSink.write(df, TextWriteFormat(columns = Seq("col1", "col2", "col3"), sep = "\t"), out)
    val fmt = TextFormat(header = Seq("col1", "col2", "col3"), sep = "\t", skip = 1)
    val back = readAll(out, fmt).orderBy("_lineno")
      .select("col1", "col2", "col3").collect().map(_.toSeq)
    assert(back.toSeq == Seq(Seq("val11", "val21", "val31"), Seq("val12", "val22", "val32")))
  }

  test("write→read roundtrip: quoted CSV keeps spaces (t/File.t:47-52)") {
    import spark.implicits._
    val df = Seq(("val 11", "val21"), ("val 12", "val22")).toDF("col 1", "col2")
    val out = Files.createTempDirectory("graft-out-").resolve("out.csv").toString
    TextSink.write(df, TextWriteFormat(columns = Seq("col 1", "col2"), sep = ",",
      quoted = true), out)
    val content = new String(Files.readAllBytes(Paths.get(out)))
    assert(content.startsWith("col 1,col2"))
    val fmt = TextFormat(header = Seq("col 1", "col2"), sep = ",", quoted = true, skip = 1)
    val back = readAll(out, fmt).orderBy("_lineno")
      .select("col 1", "col2").collect().map(_.toSeq)
    assert(back.toSeq == Seq(Seq("val 11", "val21"), Seq("val 12", "val22")))
  }

  test("write: fixed-width pads, preamble, sepHead, suppressHeader") {
    import spark.implicits._
    val df = Seq(("ab", "c"), ("d", "ef")).toDF("x", "y")
    val out1 = Files.createTempDirectory("graft-out-").resolve("fix.txt").toString
    TextSink.write(df, TextWriteFormat(columns = Seq("x", "y"), padLen = Seq(4, 3)), out1)
    assert(new String(Files.readAllBytes(Paths.get(out1))) ==
      "x   y  \nab  c  \nd   ef \n")
    val out2 = Files.createTempDirectory("graft-out-").resolve("pre.txt").toString
    TextSink.write(df, TextWriteFormat(columns = Seq("x", "y"), sep = ";",
      sepHead = Some("|"), beforeHeader = Some("# report")), out2)
    assert(new String(Files.readAllBytes(Paths.get(out2))) ==
      "# report\nx|y\nab;c\nd;ef\n")
    val out3 = Files.createTempDirectory("graft-out-").resolve("nohead.txt").toString
    TextSink.write(df, TextWriteFormat(columns = Seq("x", "y"), sep = ";",
      suppressHeader = true), out3)
    assert(new String(Files.readAllBytes(Paths.get(out3))) == "ab;c\nd;ef\n")
  }

  test("readCsv _lineno surrogate is rejected as Upsert ordering") {
    import graft.pipeline.Config._
    import graft.sinks.ParquetTable
    val f = tmp("split.csv", "1,a\n1,b\n2,c\n")
    val fmt = TextFormat(header = Seq("k", "v"), sep = ",")
    val df = TextSource.readCsv(spark, Seq(f), fmt)
    // the surrogate marker is on the column…
    val meta = df.schema("_lineno").metadata
    assert(meta.contains(TextSource.OrderSurrogateKey) &&
      meta.getBoolean(TextSource.OrderSurrogateKey))
    // …so last-wins upsert against it must refuse loudly
    val tbl = Files.createTempDirectory("graft-upsert-").resolve("t").toString
    val err = intercept[IllegalArgumentException] {
      ParquetTable.store(spark, df, tbl, DbConfig(strategy = Upsert(Seq("k"))))
    }
    assert(err.getMessage.contains("split-order surrogate"))
    // non-Upsert strategies still work from the splittable path
    ParquetTable.store(spark, df, tbl, DbConfig(strategy = Append))
    assert(ParquetTable.load(spark, tbl).count() == 3)
    // and an explicit exact ordering column re-enables upsert
    val explicitOrd = df.drop("_lineno")
      .withColumn("_lineno", org.apache.spark.sql.functions.col("v").cast("string"))
    ParquetTable.store(spark, explicitOrd, tbl,
      DbConfig(strategy = Upsert(Seq("k")), keepContent = false))
    assert(ParquetTable.load(spark, tbl).count() == 2)
  }

  test("write: cp1252 transcode on rename") {
    import spark.implicits._
    val df = Seq(("März", "1")).toDF("m", "v")
    val out = Files.createTempDirectory("graft-out-").resolve("enc.txt").toString
    TextSink.write(df, TextWriteFormat(columns = Seq("m", "v"), sep = "\t",
      encoding = "windows-1252"), out)
    val bytes = Files.readAllBytes(Paths.get(out))
    assert(new String(bytes, Charset.forName("windows-1252")).contains("März"))
    assert(bytes.count(_ == 0xe4.toByte) == 1) // single-byte ä, really cp1252
  }
}
