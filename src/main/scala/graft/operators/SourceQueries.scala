package graft.operators

import graft.Tables
import graft.sources.{TextFormat, TextSource, XlsSource, XlsxFormat, XlsxSource, XmlFormat, XmlSource}
import graft.sinks.{TextSink, TextWriteFormat, XlsSink, XlsxSink}
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
    val file = Fixtures.tempDir("graft-q26-").resolve("nation.csv").toString
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

  /** Fixed-width roundtrip over nation (S2 `format_poslen` + K1's
    * `sprintf("%-*s")` pad flavor): written left-aligned space-padded,
    * read back by byte offsets, trimmed — certifying the positional
    * column contract end-to-end. */
  def q58FixedWidthRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("string"), col("n_name"),
        col("n_regionkey").cast("string"))
      .orderBy(col("n_nationkey").cast("int"))
    val file = Fixtures.tempDir("graft-q58-").resolve("nation.fix").toString
    TextSink.write(nation,
      TextWriteFormat(columns = Seq("n_nationkey", "n_name", "n_regionkey"),
        padLen = Seq(4, 28, 4)), file)
    // DSv2 path: column pruning reaches the parser — only the selected
    // spans are substring'd ([[graft.sources.v2.GraftFixedProvider]])
    spark.read.format("graft-fixed")
      .option("header", "n_nationkey,n_name,n_regionkey")
      .option("poslen", "0-4,4-32,32-36")
      .option("skip", "1")
      .load(file)
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
    val file = Fixtures.tempDir("graft-q27-").resolve("supplier.xlsx").toString
    XlsxSink.write(sup, Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), file)
    // DSv2 path: per-cell conversion only runs for selected columns
    spark.read.format("graft-xlsx")
      .option("header", "s_suppkey,s_name,s_nationkey,s_acctbal")
      .option("worksheetId", "1")
      .load(file)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        col("s_nationkey").cast("int").as("s_nationkey"),
        col("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** Legacy xls (BIFF8) roundtrip over customer: written through the
    * graft BIFF8+CFB writer, read back through the CFB+record parser,
    * worksheet selected by NAME (xls sheets are name-addressable here,
    * unlike the reference's ordinal-only xls path). */
  def q49XlsRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("string"), col("c_name"),
        col("c_nationkey").cast("string"), col("c_acctbal").cast("string"))
      .orderBy(col("c_custkey").cast("long"))
    val file = Fixtures.tempDir("graft-q49-").resolve("customer.xls").toString
    XlsSink.write(cust, Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
      file, sheetName = "customers")
    // DSv2 path (BIFF8 provider), worksheet by name
    spark.read.format("graft-xls")
      .option("header", "c_custkey,c_name,c_nationkey,c_acctbal")
      .option("worksheet", "customers")
      .load(file)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
        col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_acctbal").cast("double").as("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** JSON-lines roundtrip over supplier — the corpus-interchange format.
    * Written via the native json sink; read back with an EXPLICIT schema
    * (schema-on-read contract: no inference pass over 100 TB). Doubles
    * survive bit-exactly (shortest round-trip encoding). */
  def q61JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    val out = Fixtures.tempDir("graft-q61-").resolve("supplier_json").toString
    sup.write.mode("overwrite").json(out)
    spark.read.schema(sup.schema).json(out).orderBy(col("s_suppkey"))
  }

  /** ORC roundtrip over part (the columnar alternative when a deployment
    * standardizes on ORC): native vectorized reader/writer, binary-exact. */
  def q62OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
    val out = Fixtures.tempDir("graft-q62-").resolve("part_orc").toString
    part.write.mode("overwrite").orc(out)
    spark.read.orc(out).orderBy(col("p_partkey"))
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
    val file = Fixtures.tempDir("graft-q28-").resolve("region.xml")
    Files.write(file, xml.toString.getBytes("UTF-8"))
    // DSv2 path: only selected fields' XPaths are compiled and evaluated
    spark.read.format("graft-xml")
      .option("header", "src,r_regionkey,r_name")
      .option("xpathRecordLevel", "//regions/list/region")
      .option("xpath.src", "/regions/meta/source")
      .option("xpath.r_regionkey", "key")
      .option("xpath.r_name", "name")
      .load(file.toString)
      .select(col("src"), col("r_regionkey").cast("int").as("r_regionkey"), col("r_name"))
      .orderBy(col("r_regionkey"))
  }

  /** Full import pipeline (SURVEY.md §3.1) inside the gate: orders → messy
    * German-locale CSV (base rows + an update batch appended) → staged load
    * with normalize/coerce → upsert-last-wins parquet table → table
    * contents. The oracle recomputes the expected table directly. */
  def q29LoadPipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Config._
    import graft.pipeline.LoadRunner
    import graft.sources.TextFormat

    val ord = Tables.orders(spark, dir).filter(col("o_orderkey") < 3000)
    val asCsv = ord.select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_orderstatus"),
      translate(format_number(col("o_totalprice"), 2), ",.", ".,").as("o_totalprice"),
      date_format(col("o_orderdate"), "dd.MM.yyyy").as("o_orderdate"))
    val base = asCsv.withColumn("_ord", lit(0))
    val updates = asCsv.filter(col("o_orderkey").cast("long") % 10 === 0)
      .withColumn("o_orderstatus", lit("U")).withColumn("_ord", lit(1))
    val staged = base.unionByName(updates)
      .orderBy(col("_ord"), col("o_orderkey").cast("long")).drop("_ord")
    val dirPath = Fixtures.tempDir("graft-q29-")
    val csv = dirPath.resolve("orders.csv").toString
    TextSink.write(staged, TextWriteFormat(
      columns = Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
      sep = ";"), csv)

    val load = LoadRunner.Load(
      source = LoadRunner.TextSpec(TextFormat(
        header = Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
        sep = ";", skip = 1, thousandSep = ".", decimalSep = ",")),
      db = DbConfig(
        targetSchema = Seq(
          TargetColumn("o_orderkey", "bigint"),
          TargetColumn("o_orderstatus", "varchar", size = 10),
          TargetColumn("o_totalprice", "double"),
          TargetColumn("o_orderdate", "datetime")),
        strategy = Upsert(Seq("o_orderkey"))))
    val table = dirPath.resolve("orders_table").toString
    LoadRunner.run(spark, Seq(csv), load, table)
    graft.sinks.ParquetTable.load(spark, table).orderBy(col("o_orderkey"))
  }

  /** q117: a load declared ENTIRELY in config files — including the
    * reference's eval-hook surface expressed as config SQL strings
    * (`addtlProcessing` field rewrite, `lineProcessing.<col>` row
    * assignment reading `_prev`, `lineFilter` row drop; reference
    * `Wrap/File.pm:470-489`, driven like `Test/test.pl:3-64`) — runs
    * through [[graft.pipeline.ConfigFiles.bootLoads]] with no code-side
    * hooks. The oracle recomputes the rewrite/lag/filter in SQL. */
  def q117ConfigHooks(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{ConfigFiles, LoadRunner}
    val nat = Tables.nation(spark, dir).select(
      col("n_nationkey").cast("string").as("n_nationkey"),
      col("n_name"),
      col("n_regionkey").cast("string").as("n_regionkey"))
      .orderBy(col("n_nationkey").cast("int"))
    val dirPath = Fixtures.tempDir("graft-q117-")
    val csv = dirPath.resolve("nation.csv").toString
    TextSink.write(nat, TextWriteFormat(
      columns = Seq("n_nationkey", "n_name", "n_regionkey"), sep = ";"), csv)
    Files.writeString(dirPath.resolve("site.config"),
      """[config]
        |folderEnvironmentMapping. = Prod
        |[load.1.File]
        |header = n_nationkey, n_name, n_regionkey
        |sep = ;
        |skip = 1
        |addtlProcessingTrigger = n_name
        |addtlProcessing = upper(_field)
        |lineProcessing.prev_key = coalesce(_prev.n_nationkey, '-')
        |lineFilter = n_regionkey <> '2'
        |[load.1.DB]
        |table = nation_hooked
        |strategy = append
        |""".stripMargin)
    val loads = ConfigFiles.bootLoads(dirPath, "prod")
      .fold(e => throw new IllegalStateException(e), _._1)
    val table = dirPath.resolve("nation_hooked").toString
    LoadRunner.run(spark, Seq(csv), loads.head, table)
    graft.sinks.ParquetTable.load(spark, table)
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"),
        col("prev_key"))
      .orderBy(col("n_nationkey"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_config_hooks"  -> q117ConfigHooks _,
    "q26_text_roundtrip" -> q26TextRoundtrip _,
    "q27_xlsx_roundtrip" -> q27XlsxRoundtrip _,
    "q28_xml_roundtrip"  -> q28XmlRoundtrip _,
    "q29_load_pipeline"  -> q29LoadPipeline _,
    "q49_xls_roundtrip"  -> q49XlsRoundtrip _,
    "q58_fixed_width"    -> q58FixedWidthRoundtrip _,
    "q61_json_roundtrip" -> q61JsonRoundtrip _,
    "q62_orc_roundtrip"  -> q62OrcRoundtrip _,
  )

  val oracles: Map[String, String] = Map(
    "q117_config_hooks" ->
      """SELECT * FROM (
        |  SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey,
        |    coalesce(lag(CAST(n_nationkey AS VARCHAR))
        |      OVER (ORDER BY n_nationkey), '-') AS prev_key
        |  FROM nation)
        |WHERE n_regionkey <> 2
        |ORDER BY n_nationkey""".stripMargin,
    "q26_text_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q58_fixed_width" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q61_json_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "q62_orc_roundtrip" ->
      "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part ORDER BY p_partkey",
    "q27_xlsx_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
    "q49_xls_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer ORDER BY c_custkey",
    "q28_xml_roundtrip" ->
      "SELECT 'graft' AS src, r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q29_load_pipeline" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey < 3000
        |ORDER BY o_orderkey""".stripMargin,
  )
}
