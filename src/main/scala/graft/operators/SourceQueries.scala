package graft.operators

import graft.Tables
import graft.sources.{TextFormat, TextSource, XlsxFormat, XlsxSource, XmlFormat, XmlSource}
import graft.sinks.{TextSink, TextWriteFormat, XlsxSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink conformance as driver-contract queries: each writes a table
  * through a graft sink, reads it back through the matching graft source,
  * and returns the reconstructed relation — the DuckDB oracle compares
  * against the ORIGINAL parquet table, so a pass certifies full write+read
  * fidelity of the format implementation (SURVEY.md §2.1 S1/S4/S5, §2.5
  * K1/K2).
  */
object SourceQueries {

  /** Quoted-CSV roundtrip over nation (incl. numeric re-coercion). */
  def q26TextRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("string"), col("n_name"),
        col("n_regionkey").cast("string"))
      .orderBy(col("n_nationkey").cast("int"))
    val file = Files.createTempDirectory("graft-q26-").resolve("nation.csv").toString
    TextSink.write(nation,
      TextWriteFormat(columns = Seq("n_nationkey", "n_name", "n_regionkey"),
        sep = ",", quoted = true), file)
    val fmt = TextFormat(header = Seq("n_nationkey", "n_name", "n_regionkey"),
      sep = ",", quoted = true, skip = 1)
    TextSource.read(spark, Seq(file), fmt)
      .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
      .orderBy(col("n_nationkey"))
  }

  /** xlsx roundtrip over supplier (numbers survive as numeric cells). */
  def q27XlsxRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("string"), col("s_name"),
        col("s_nationkey").cast("string"), col("s_acctbal").cast("string"))
      .orderBy(col("s_suppkey").cast("long"))
    val file = Files.createTempDirectory("graft-q27-").resolve("supplier.xlsx").toString
    XlsxSink.write(sup, Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), file)
    val fmt = XlsxFormat(
      header = Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      worksheetId = Some(1))
    XlsxSource.read(spark, Seq(file), fmt)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("int").as("s_nationkey"),
        col("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** XML roundtrip over region: document built driver-side (25 rows),
    * parsed back distributed with an absolute-XPath constant column. */
  def q28XmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.region(spark, dir)
      .orderBy(col("r_regionkey")).collect()
    val xml = new StringBuilder("<regions><meta><source>graft</source></meta><list>")
    rows.foreach { r =>
      xml.append(s"<region><key>${r.getInt(0)}</key><name>${r.getString(1)}</name></region>")
    }
    xml.append("</list></regions>")
    val file = Files.createTempDirectory("graft-q28-").resolve("region.xml")
    Files.write(file, xml.toString.getBytes("UTF-8"))
    val fmt = XmlFormat(
      header = Seq("src", "r_regionkey", "r_name"),
      xpathRecordLevel = "//regions/list/region",
      fieldXpath = Map("src" -> "/regions/meta/source",
        "r_regionkey" -> "key", "r_name" -> "name"))
    XmlSource.read(spark, Seq(file.toString), fmt)
      .select(col("src"), col("r_regionkey").cast("int").as("r_regionkey"), col("r_name"))
      .orderBy(col("r_regionkey"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_text_roundtrip" -> q26TextRoundtrip _,
    "q27_xlsx_roundtrip" -> q27XlsxRoundtrip _,
    "q28_xml_roundtrip"  -> q28XmlRoundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "q26_text_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q27_xlsx_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "q28_xml_roundtrip" ->
      "SELECT 'graft' AS src, r_regionkey, r_name FROM region ORDER BY r_regionkey",
  )
}
