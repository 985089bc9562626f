package graft

import graft.pipeline._
import graft.pipeline.Config._
import graft.pipeline.LoadRunner._
import graft.sources.TextFormat
import graft.sinks.ParquetTable
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.time.{LocalDate, LocalTime, LocalDateTime}

/** End-to-end import pipeline (SURVEY.md §3.1) plus the driver-side state
  * machines: run gates, retry scheduling, staging lifecycle. */
class PipelineSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("end-to-end load: messy CSV → hooks → coercion → upsert table") {
    val work = tmpDir("graft-e2e-")
    val csv = java.nio.file.Paths.get(work, "data.csv")
    Files.write(csv, (
      "id;name;amount;booked\n" +
      "1;alpha;1.234.567,89;02.01.2024\n" +
      "2;beta;150-;20240103120000\n" +
      "3;gamma;N/A;N/A\n" +
      "2;beta2;17%;02.01.24\n").getBytes("UTF-8"))

    val load = Load(
      source = TextSpec(TextFormat(
        header = Seq("id", "name", "amount", "booked"), sep = ";", skip = 1,
        thousandSep = ".", decimalSep = ",")),
      db = DbConfig(
        targetSchema = Seq(
          TargetColumn("id", "bigint"),
          TargetColumn("name", "varchar", size = 20),
          TargetColumn("amount", "double"),
          TargetColumn("booked", "datetime")),
        strategy = Upsert(Seq("id"))),
      hooks = LoadHooks(
        fieldHooks = Map("name" -> (c => upper(c)))))

    val table = tmpDir("graft-table-") + "/t"
    val result = LoadRunner.run(spark, Seq(csv.toString), load, table)
    assert(result.rows == 3) // id=2 deduped last-wins
    assert(result.errors.exists(_.contains("non-numeric")))   // N/A amount
    assert(result.errors.exists(_.contains("invalid date")))  // N/A booked

    val rows = ParquetTable.load(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), r.get(3) != null))
    assert(rows(0) == ((1L, "ALPHA", Some(1234567.89), true)))
    // last-wins: beta2 with 17% → 17.0, 2-digit year date
    assert(rows(1) == ((2L, "BETA2", Some(17.0), true)))
    assert(rows(2) == ((3L, "GAMMA", None, false)))
  }

  test("severity-2 string overflow aborts the load (Wrap/DB.pm:305-308)") {
    val work = tmpDir("graft-e2e-")
    val csv = java.nio.file.Paths.get(work, "d.csv")
    Files.write(csv, "id;name\n1;waytoolongvalue\n".getBytes("UTF-8"))
    val load = Load(
      source = TextSpec(TextFormat(header = Seq("id", "name"), sep = ";", skip = 1)),
      db = DbConfig(targetSchema = Seq(
        TargetColumn("id", "bigint"), TargetColumn("name", "varchar", size = 5))))
    intercept[IllegalStateException] {
      LoadRunner.run(spark, Seq(csv.toString), load, tmpDir("graft-table-") + "/t")
    }
  }

  test("previous-row context reaches the row hook (W1)") {
    val work = tmpDir("graft-e2e-")
    val csv = java.nio.file.Paths.get(work, "d.csv")
    Files.write(csv, "v\n10\n25\n45\n".getBytes("UTF-8"))
    val load = Load(
      source = TextSpec(TextFormat(header = Seq("v"), sep = ";", skip = 1)),
      db = DbConfig(),
      hooks = LoadHooks(needPrevRow = true,
        rowHook = Some(df => df.withColumn("delta",
          col("v").cast("double") - col("_prev.v").cast("double")))))
    val table = tmpDir("graft-table-") + "/t"
    LoadRunner.run(spark, Seq(csv.toString), load, table)
    val deltas = ParquetTable.load(spark, table)
      .orderBy(col("v").cast("double"))
      .select("v", "delta").collect()
      .map(r => (r.getString(0), Option(r.get(1))))
    assert(deltas.toSeq == Seq(("10", None), ("25", Some(15.0)), ("45", Some(20.0))))
  }

  test("delete-insert and append strategies against an existing table") {
    import spark.implicits._
    val table = tmpDir("graft-table-") + "/t"
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .withColumn("_lineno", monotonically_increasing_id())
    ParquetTable.store(spark, base, table, DbConfig(strategy = Append))
    val incoming = Seq((2L, "B2"), (9L, "new")).toDF("k", "v")
      .withColumn("_lineno", monotonically_increasing_id())
    ParquetTable.store(spark, incoming, table,
      DbConfig(strategy = DeleteInsert(Seq("k")), keepContent = true))
    val rows = ParquetTable.load(spark, table).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("incremental upsert keeps target values where incoming is NULL (Wrap/DB.pm:318)") {
    import spark.implicits._
    val table = tmpDir("graft-incr-") + "/t"
    val base = Seq((1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)))
      .toDF("k", "v", "n").withColumn("_lineno", monotonically_increasing_id())
    ParquetTable.store(spark, base, table, DbConfig(strategy = Append))
    // row 1: v updated, n NULL -> n stays 10; row 2 arrives twice — the
    // later row's NULL v must not erase the earlier row's update either
    val incoming = Seq(
      (1L, Some("A2"), None: Option[Long]),
      (2L, Some("B2"), Some(21L)),
      (2L, None: Option[String], Some(22L)),
      (3L, Some("c"), None: Option[Long])).toDF("k", "v", "n")
      .withColumn("_lineno", monotonically_increasing_id())
    ParquetTable.store(spark, incoming, table,
      DbConfig(strategy = Upsert(Seq("k")), keepContent = true,
        incrementalStore = true))
    val rows = ParquetTable.load(spark, table).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.toSeq == Seq(
      (1L, "A2", Some(10L)),   // NULL n preserved target's 10
      (2L, "B2", Some(22L)),   // NULL v on the later row kept B2; n cascaded
      (3L, "c", None)))        // fresh insert keeps its NULL
  }

  test("insertIgnoreDups appends absent keys only, first-wins in batch (Wrap/DB.pm:403)") {
    import spark.implicits._
    val table = tmpDir("graft-ignoredup-") + "/t"
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .withColumn("_lineno", monotonically_increasing_id())
    ParquetTable.store(spark, base, table, DbConfig(strategy = Append))
    val incoming = Seq((2L, "SHOULD_NOT_WIN"), (3L, "first"), (3L, "second"))
      .toDF("k", "v").withColumn("_lineno", monotonically_increasing_id())
    ParquetTable.store(spark, incoming, table,
      DbConfig(strategy = InsertIgnoreDups(Seq("k")), keepContent = true))
    val rows = ParquetTable.load(spark, table).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "first")))
  }

  test("run gates: holidays, weekends, first business day (Common.pm:296-340)") {
    import RunGates._
    val p0 = ProcessConfig()
    assert(evaluate(p0, LocalDate.of(2024, 1, 1)) == Run) // no gates
    val pHol = ProcessConfig(skipHolidays = "1")          // default AT
    assert(evaluate(pHol, LocalDate.of(2024, 1, 1)).isInstanceOf[Skip])
    assert(evaluate(pHol, LocalDate.of(2024, 1, 2)) == Run)
    val pWe = ProcessConfig(skipWeekends = true)
    assert(evaluate(pWe, LocalDate.of(2024, 7, 6)).isInstanceOf[Skip]) // Saturday
    assert(evaluate(pWe, LocalDate.of(2024, 7, 8)) == Run)
    // first business day of July 2024 is Monday the 1st
    val pFb = ProcessConfig(skipForFirstBusinessDate = "AT")
    assert(evaluate(pFb, LocalDate.of(2024, 7, 1)) == Run)
    assert(evaluate(pFb, LocalDate.of(2024, 7, 2)).isInstanceOf[Skip])
    // Jan 2022: 1st=Sat, 2nd=Sun, 3rd=Mon → first business day is the 3rd
    assert(evaluate(pFb, LocalDate.of(2022, 1, 3)) == Run)
    assert(evaluate(pFb, LocalDate.of(2022, 1, 2)).isInstanceOf[Skip]) // weekend
    // redo bypasses gates
    assert(evaluate(pHol.copy(redoFile = true), LocalDate.of(2024, 1, 1)) == Run)
  }

  test("retry scheduler cadences and cutoffs (Wrap.pm:604-631)") {
    import RetryScheduler._
    val p = ProcessConfig(plannedUntil = "1800", retrySecondsErr = 60,
      retrySecondsPlanned = 300)
    // success on a planned load → keep repeating on planned cadence
    val s1 = afterRun(p, State(), hadErrors = false)
    assert(!s1.processEnd && s1.firstRunSuccess)
    assert(nextAction(p, s1, LocalTime.of(12, 0)) == Sleep(300, false))
    // error after first success → still planned cadence (R3)
    val s2 = afterRun(p, s1, hadErrors = true)
    assert(!s2.retryBecauseOfError)
    // error without prior success → error cadence
    val s3 = afterRun(p, State(), hadErrors = true)
    assert(s3.retryBecauseOfError)
    assert(nextAction(p, s3, LocalTime.of(12, 0)) == Sleep(60, true))
    // cutoff reached
    assert(nextAction(p, s1, LocalTime.of(18, 0)).isInstanceOf[Finish])
    // midnight wrap
    val pLate = ProcessConfig(plannedUntil = "2359", retrySecondsPlanned = 3600)
    val sLate = afterRun(pLate, State(), hadErrors = false)
    assert(nextAction(pLate, sLate, LocalTime.of(23, 30)).isInstanceOf[Finish])
    // one-shot success ends the process
    val pOnce = ProcessConfig()
    assert(afterRun(pOnce, State(), hadErrors = false).processEnd)
  }

  test("staging lifecycle: land, check, archive with timestamp, redo") {
    val src = tmpDir("graft-src-")
    val work = tmpDir("graft-work-")
    val hist = tmpDir("graft-hist-")
    Files.write(java.nio.file.Paths.get(src, "a.csv"), "x\n1\n".getBytes)
    Files.write(java.nio.file.Paths.get(src, "b.csv"), "x\n2\n".getBytes)
    val staging = new FileStaging(work, hist,
      clock = () => LocalDateTime.of(2024, 7, 8, 12, 0, 0))
    val landed = staging.getLocalFiles(s"$src/*.csv")
    assert(landed == Seq("a.csv", "b.csv"))
    val (present, missing) = staging.checkFiles(Seq("a.csv", "b.csv", "c.csv"),
      optional = Set("c.csv"))
    assert(present == Seq("a.csv", "b.csv") && missing.isEmpty)
    val (_, hardMissing) = staging.checkFiles(Seq("nope.csv"))
    assert(hardMissing == Seq("nope.csv"))
    staging.markProcessed(Seq("a.csv", "b.csv"))
    val archived = staging.finish()
    assert(archived == Seq("a_20240708_120000.csv", "b_20240708_120000.csv"))
    // redo de-timestamps back to canonical name
    val redone = staging.redoFiles("a.csv")
    assert(redone == Seq("a.csv"))
    assert(Files.exists(java.nio.file.Paths.get(work, "a.csv")))
  }

  test("zip extraction joins members to the load (Wrap.pm:285-299)") {
    val work = tmpDir("graft-work-")
    val hist = tmpDir("graft-hist-")
    val zip = java.nio.file.Paths.get(work, "batch.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("inner.csv"))
    zos.write("x\n42\n".getBytes); zos.closeEntry(); zos.close()
    val staging = new FileStaging(work, hist)
    val members = staging.extractArchives("batch.zip")
    assert(members == Seq("inner.csv"))
    assert(Files.exists(java.nio.file.Paths.get(work, "inner.csv")))
  }
}
