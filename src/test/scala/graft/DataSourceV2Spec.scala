package graft

import graft.sources._
import graft.sinks.{TextSink, TextWriteFormat, XlsSink, XlsxSink}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DSv2 table providers (graft-xlsx / graft-xls / graft-xml /
  * graft-fixed): result parity with the classic object-API paths, and the
  * property the registration exists for — column pruning REACHING the
  * parser (the scan's readSchema shrinks to the query's columns). */
class DataSourceV2Spec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix)

  private val header = Seq("k", "name", "grp")

  test("graft-fixed matches TextSource.read and prunes to selected spans") {
    val dir = tmp("graft-v2-fix-")
    val df = spark.createDataFrame(Seq(("1", "alpha", "10"), ("2", "beta", "20"),
      ("3", "gamma", "30"))).toDF(header: _*)
    val file = dir.resolve("data.fix").toString
    TextSink.write(df, TextWriteFormat(columns = header, padLen = Seq(4, 8, 4)), file)
    val fmt = TextFormat(header = header,
      poslen = Seq((0, 4), (4, 12), (12, 16)), skip = 1)
    val classic = TextSource.read(spark, Seq(file), fmt)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    val v2df = spark.read.format("graft-fixed")
      .option("header", header.mkString(","))
      .option("poslen", "0-4,4-12,12-16")
      .option("skip", "1")
      .load(file)
    assert(v2df.columns.toSeq == Seq("_file", "_lineno", "k", "name", "grp"))
    val v2 = v2df.select("k", "name", "grp")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(v2.toSeq == classic.toSeq)
    // pruning reaches the scan: the physical plan's scan schema drops
    // everything but the selected column
    val plan = v2df.select("name").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: name") || plan.contains("ReadSchema: [name]")
      || plan.contains("graft-fixed ReadSchema: name"),
      s"scan not pruned to 'name':\n$plan")
  }

  test("graft-xlsx matches XlsxSource.read; _file/_lineno service columns work") {
    val dir = tmp("graft-v2-xlsx-")
    val df = spark.createDataFrame(Seq(("1", "alpha", "10"), ("2", "beta", "20"))
      ).toDF(header: _*)
    val file = dir.resolve("data.xlsx").toString
    XlsxSink.write(df, header, file)
    val fmt = XlsxFormat(header = header, worksheetId = Some(1))
    val classic = XlsxSource.read(spark, Seq(file), fmt)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    val v2df = spark.read.format("graft-xlsx")
      .option("header", header.mkString(","))
      .option("worksheetId", "1").load(file)
    val v2 = v2df.select("k", "name", "grp")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(v2.toSeq == classic.toSeq)
    // service columns survive when asked for
    val withMeta = v2df.select("_file", "_lineno", "k").collect()
    assert(withMeta.forall(_.getString(0).nonEmpty))
    assert(withMeta.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("graft-xls (BIFF8) matches XlsSource.read incl. worksheet by name") {
    val dir = tmp("graft-v2-xls-")
    val df = spark.createDataFrame(Seq(("1", "alpha", "10"), ("2", "beta", "20"))
      ).toDF(header: _*)
    val file = dir.resolve("data.xls").toString
    XlsSink.write(df, header, file, sheetName = "sheetz")
    val fmt = XlsxFormat(header = header, worksheet = Some("sheetz"))
    val classic = XlsSource.read(spark, Seq(file), fmt)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    val v2 = spark.read.format("graft-xls")
      .option("header", header.mkString(","))
      .option("worksheet", "sheetz").load(file)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(v2.toSeq == classic.toSeq)
  }

  test("graft-xml matches XmlSource.read; pruned scan skips absent XPaths") {
    val dir = tmp("graft-v2-xml-")
    val xml = "<root><meta><src>m</src></meta><list>" +
      "<r><a>1</a><b>x</b></r><r><a>2</a><b>y</b></r></list></root>"
    val file = dir.resolve("data.xml")
    Files.write(file, xml.getBytes("UTF-8"))
    val fmt = XmlFormat(header = Seq("src", "a", "b"),
      xpathRecordLevel = "//root/list/r",
      fieldXpath = Map("src" -> "/root/meta/src", "a" -> "a", "b" -> "b"))
    val classic = XmlSource.read(spark, Seq(file.toString), fmt)
      .select("src", "a", "b").collect().map(_.toSeq).sortBy(_(1).toString)
    val v2df = spark.read.format("graft-xml")
      .option("header", "src,a,b")
      .option("xpathRecordLevel", "//root/list/r")
      .option("xpath.src", "/root/meta/src")
      .option("xpath.a", "a").option("xpath.b", "b")
      .load(file.toString)
    val v2 = v2df.select("src", "a", "b").collect().map(_.toSeq).sortBy(_(1).toString)
    assert(v2.toSeq == classic.toSeq)
    // a query that only selects `a` must not fail even if another column's
    // xpath were expensive/broken — pruned fields are never evaluated;
    // prove by pointing b at an invalid function and selecting only a
    val pruned = spark.read.format("graft-xml")
      .option("header", "a,b")
      .option("xpathRecordLevel", "//root/list/r")
      .option("xpath.a", "a").option("xpath.b", "boom((")
      .load(file.toString)
      .select("a").collect().map(_.getString(0)).sorted
    assert(pruned.toSeq == Seq("1", "2"))
  }

  test("graft-text matches TextSource.read: plain sep, quoted CSV, regex sep") {
    val dir = tmp("graft-v2-text-")
    // plain sep with an embedded-quote-free payload
    val plain = dir.resolve("plain.csv")
    Files.write(plain, "k;name;grp\n1;alpha;10\n2;beta;20\n;empty;3\n".getBytes("UTF-8"))
    val plainFmt = TextFormat(header = header, sep = ";", skip = 1)
    val classicPlain = TextSource.read(spark, Seq(plain.toString), plainFmt)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    val v2Plain = spark.read.format("graft-text")
      .option("header", header.mkString(",")).option("sep", ";")
      .option("skip", "1").load(plain.toString)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(v2Plain.toSeq == classicPlain.toSeq) // incl. dropEmptyFirstField

    // quoted CSV: embedded separator, doubled quote, unquoted numerics
    val quoted = dir.resolve("quoted.csv")
    Files.write(quoted,
      "k,name,grp\n1,\"al,pha\",10\n2,\"say \"\"hi\"\"\",20\n3,plain,30\n"
        .getBytes("UTF-8"))
    val quotedFmt = TextFormat(header = header, sep = ",", quoted = true, skip = 1)
    val classicQuoted = TextSource.read(spark, Seq(quoted.toString), quotedFmt)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    val v2Quoted = spark.read.format("graft-text")
      .option("header", header.mkString(",")).option("sep", ",")
      .option("quoted", "true").option("skip", "1").load(quoted.toString)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(v2Quoted.toSeq == classicQuoted.toSeq)

    // regex separator + skipUntil
    val rx = dir.resolve("rx.txt")
    Files.write(rx,
      "junk preamble\n--data--\n1  |alpha| 10\n2 |beta |20\n".getBytes("UTF-8"))
    val rxFmt = TextFormat(header = header, sep = "\\s*\\|\\s*",
      sepIsRegex = true, skipUntil = Some("^--data--$"))
    val classicRx = TextSource.read(spark, Seq(rx.toString), rxFmt)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    val v2Rx = spark.read.format("graft-text")
      .option("header", header.mkString(",")).option("sep", "\\s*\\|\\s*")
      .option("sepIsRegex", "true").option("skipUntil", "^--data--$")
      .load(rx.toString)
      .select("k", "name", "grp").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(v2Rx.toSeq == classicRx.toSeq)
  }

  test("DSv2 statistics make a small source broadcastable in joins") {
    val dir = tmp("graft-v2-stats-")
    val f = dir.resolve("dim.fix")
    Files.write(f, "k  name    \n1  alpha   \n2  beta    \n".getBytes("UTF-8"))
    val dim = spark.read.format("graft-fixed")
      .option("header", "k,name").option("poslen", "0-3,3-11")
      .option("skip", "1").load(f.toString)
    val fact = spark.range(1000).selectExpr("CAST(id % 3 AS STRING) AS k", "id")
    val plan = fact.join(dim, Seq("k")).queryExecution.executedPlan.toString
    // file-size statistics put the dim under the broadcast threshold;
    // without SupportsReportStatistics this plans a sort-merge join
    assert(plan.contains("BroadcastHashJoin"),
      s"small DSv2 dim not broadcast:\n${plan.take(500)}")
  }

  test("count(*) over a DSv2 table prunes to the empty schema and still counts") {
    val dir = tmp("graft-v2-count-")
    val f = dir.resolve("d.fix")
    Files.write(f, "k  name    \n1  row1   \n2  row2   \n".getBytes("UTF-8"))
    val n = spark.read.format("graft-fixed")
      .option("header", "k,name").option("poslen", "0-3,3-11")
      .option("skip", "1").load(f.toString).count()
    assert(n == 2)
  }

  test("multi-file load lists files and keeps per-file line numbers") {
    val dir = tmp("graft-v2-multi-")
    for (i <- 1 to 3) {
      val f = dir.resolve(s"f$i.fix")
      Files.write(f, s"k  name    \n$i  row$i   \n".getBytes("UTF-8"))
    }
    val v2 = spark.read.format("graft-fixed")
      .option("header", "k,name").option("poslen", "0-3,3-11")
      .option("skip", "1")
      .load(dir.toString + "/*.fix")
    assert(v2.count() == 3)
    assert(v2.select("_lineno").collect().forall(_.getLong(0) == 1L))
  }

  test("_file filter pushdown prunes the planned partitions") {
    val dir = tmp("graft-v2-push-")
    for (i <- 1 to 4) {
      val f = dir.resolve(s"f$i.csv")
      Files.write(f, s"k,name\n$i,row$i\n${i}0,row${i}0\n".getBytes("UTF-8"))
    }
    val v2 = spark.read.format("graft-text")
      .option("header", "k,name").option("sep", ",").option("skip", "1")
      .load(dir.toString + "/*.csv")
    val onlyF2 = v2.filter(col("_file").endsWith("f2.csv"))
    // values correct (residual applies regardless of pruning)
    assert(onlyF2.select("k").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("2", "20"))
    // the pushed filter reaches the scan and prunes the file listing
    val plan = onlyF2.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("PushedFilters: [StringEndsWith(_file,f2.csv)]"),
      s"no pushed _file filter in plan:\n$planStr")
    val scans = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.partitions.size == 1,
      s"expected 1 pruned partition, got ${scans.map(_.partitions.size)}")
    // an unsupported filter (on a data column) is NOT claimed as pushed
    val unp = v2.filter(col("k") === "2").queryExecution.executedPlan.toString
    assert(unp.contains("PushedFilters: []"), s"claimed unsupported push:\n$unp")
  }

  test("_lineno upper-bound pushdown stops the parser early, values exact") {
    val dir = tmp("graft-v2-line-")
    val body = "k,name\n" + (1 to 100).map(i => s"$i,row$i").mkString("\n") + "\n"
    Files.write(dir.resolve("big.csv"), body.getBytes("UTF-8"))
    val v2 = spark.read.format("graft-text")
      .option("header", "k,name").option("sep", ",").option("skip", "1")
      .load(dir.resolve("big.csv").toString)
    val head3 = v2.filter(col("_lineno") <= 3)
    assert(head3.select("k").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1", "2", "3"))
    assert(head3.queryExecution.executedPlan.toString
      .contains("PushedFilters: [LessThanOrEqual(_lineno,3)]"))
    // exact-match bound: prunes to a prefix, residual picks the line
    val one = v2.filter(col("_lineno") === 42L)
    assert(one.select("k").collect().map(_.getString(0)).toSeq == Seq("42"))
  }
}
