package graft

import graft.sources.{XmlFormat, XmlSource}
import java.nio.file.Files

/** XML fixtures from the reference's `t/File.t:83-103` (FIXTURES.md §4):
  * nested records, absolute-XPath constant column, namespaces. */
class XmlSourceSpec extends SparkSpec {

  private def tmp(content: String): String = {
    val d = Files.createTempDirectory("graft-xml-test-")
    val p = d.resolve("test.xml")
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("nested records + absolute XPath constant column (t/File.t:83-92)") {
    val f = tmp("<topleveldata><coldata>topleveldataVal</coldata><sublevel>" +
      "<datalevel><record><col2>val21</col2><sub><col3>val31</col3></sub></record>" +
      "<record><col2>val22</col2><sub><col3>val32</col3></sub></record>" +
      "</datalevel></sublevel></topleveldata>")
    val fmt = XmlFormat(
      header = Seq("col1", "col2", "col3"),
      xpathRecordLevel = "//sublevel/datalevel/*",
      fieldXpath = Map(
        "col1" -> "//topleveldata/coldata",
        "col2" -> "col2",
        "col3" -> "sub/col3"))
    val rows = XmlSource.read(spark, Seq(f), fmt).orderBy("_lineno")
      .select("col1", "col2", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("topleveldataVal", "val21", "val31"),
      Seq("topleveldataVal", "val22", "val32")))
  }

  test("namespaced XML (t/File.t:95-103)") {
    val f = tmp("<topleveldata xmlns=\"https://some.funny.namespace\">" +
      "<coldata>topleveldataVal</coldata><sublevel><datalevel>" +
      "<record><col2>val21</col2><sub><col3>val31</col3></sub></record>" +
      "<record><col2>val22</col2><sub><col3>val32</col3></sub></record>" +
      "</datalevel></sublevel></topleveldata>")
    val fmt = XmlFormat(
      header = Seq("col1", "col2", "col3"),
      xpathRecordLevel = "//e:sublevel/e:datalevel/*",
      fieldXpath = Map(
        "col1" -> "//e:topleveldata/e:coldata",
        "col2" -> "e:col2",
        "col3" -> "e:sub/e:col3"),
      namespaces = Map("e" -> "https://some.funny.namespace"))
    val rows = XmlSource.read(spark, Seq(f), fmt).orderBy("_lineno")
      .select("col1", "col2", "col3").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("topleveldataVal", "val21", "val31"),
      Seq("topleveldataVal", "val22", "val32")))
  }

  test("numeric normalization applies to XML fields too") {
    val f = tmp("<d><r><v>22.123.123,013</v></r></d>")
    val fmt = XmlFormat(header = Seq("v"), xpathRecordLevel = "//d/r",
      fieldXpath = Map("v" -> "v"), thousandSep = ".", decimalSep = ",")
    val rows = XmlSource.read(spark, Seq(f), fmt).select("v").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("22123123.013"))
  }
}
