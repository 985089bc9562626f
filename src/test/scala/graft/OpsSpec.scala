package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{CliOverrides, Monitoring}

/** CLI override parsing (Common.pm:370-407) and monitoring frequency gates
  * (checkLogExist.pl:20-104). */
class OpsSpec extends AnyFunSuite {

  private val permitted = Map(
    "DB" -> Map[String, Any]("table" -> "", "cutoffYr2000" -> 60),
    "File" -> Map[String, Any]("filename" -> "", "optional" -> false),
    "process" -> Map[String, Any]("plannedUntil" -> "", "retrySecondsErr" -> 60),
    "config" -> Map[String, Any]("env" -> ""))

  test("global and per-load overrides with numeric conversion") {
    val r = CliOverrides.parse(Seq(
      "--DB", "table=mytab", "--DB", "cutoffYr2000=50",
      "--load2File", "filename=other.csv", "--process", "retrySecondsErr=5"),
      permitted)
    val o = r.toOption.get
    assert(o.global("DB")("table") == "mytab")
    assert(o.global("DB")("cutoffYr2000") == 50L) // numeric-typed key converted
    assert(o.global("process")("retrySecondsErr") == 5L)
    assert(o.perLoad(2)("File")("filename") == "other.csv")
  }

  test("unknown keys rejected with available-options listing") {
    val r = CliOverrides.parse(Seq("--DB", "nosuchkey=1"), permitted)
    assert(r.isLeft)
    val msg = r.swap.toOption.get
    assert(msg.contains("option not allowed: --DB nosuchkey=<value>"))
    assert(msg.contains("--DB table=<value>"))
  }

  test("frequency gates (B/D/M1/Q/ML/W/MW)") {
    import Monitoring.frequencyDue
    assert(frequencyDue("B", "20240702"))              // Tuesday
    assert(!frequencyDue("B", "20240706"))             // Saturday
    assert(!frequencyDue("B", "20240101"))             // AT holiday
    assert(frequencyDue("D", "20240706"))
    assert(frequencyDue("M1", "20240701"))
    assert(!frequencyDue("M1", "20240702"))
    assert(frequencyDue("Q", "20240102"))
    assert(frequencyDue("Q", "20240401"))
    assert(!frequencyDue("Q", "20240101"))
    assert(frequencyDue("ML", "20240731"))
    assert(!frequencyDue("ML", "20240730"))
    assert(frequencyDue("W3", "20240702"))             // Tuesday = 3 (1=Sun)
    assert(!frequencyDue("W3", "20240703"))
    assert(frequencyDue("MW1", "20240701"))            // first Monday (0=Sun..6=Sat)
    assert(!frequencyDue("MW1", "20240708"))
    assert(frequencyDue("", "20240702"))               // default = B
  }

  test("log start-entry scan accepts 3 date formats") {
    import Monitoring.logHasStartEntry
    val ymd = "20240702"
    assert(logHasStartEntry(Iterator("02-07-2024 10:00\tINFO\tjob alpha started"),
      ymd, "job alpha started"))
    assert(logHasStartEntry(Iterator("02.07.2024 10:00\tINFO\tjob alpha started"),
      ymd, "alpha"))
    assert(logHasStartEntry(Iterator("2024-07-02T10:00:00\tstarting alpha"),
      ymd, "starting"))
    assert(!logHasStartEntry(Iterator("01-07-2024 10:00\tjob alpha started"),
      ymd, "alpha")) // wrong date
    assert(!logHasStartEntry(Iterator("02-07-2024 10:00\tother job"),
      ymd, "alpha")) // regex miss
  }

  test("checkJobs alerts only due-and-missing jobs, through the sink") {
    import Monitoring._
    val logs = Map(
      "alpha" -> Seq("02-07-2024 10:00\tjob alpha started"),   // due + present
      "beta"  -> Seq("02-07-2024 10:00\tunrelated"),           // due + MISSING
      "gamma" -> Seq.empty[String])                            // not due (M1)
    val jobs = Seq(
      JobCheck("alpha", "B", "alpha started"),
      JobCheck("beta", "B", "beta started",
        errmailaddress = "oncall@example", errmailsubject = "beta down"),
      JobCheck("gamma", "M1", "gamma started"))
    val out = java.nio.file.Files.createTempDirectory("graft-alerts-")
      .resolve("alerts.jsonl")
    val raised = checkJobs(jobs, "20240702",
      name => logs(name).iterator, new FileAlertSink(out))
    assert(raised.map(_.job) == Seq("beta"))
    assert(raised.head.recipient == "oncall@example" &&
      raised.head.subject == "beta down")
    val lines = java.nio.file.Files.readAllLines(out)
    assert(lines.size == 1 && lines.get(0).contains("\"job\":\"beta\""))
  }
}
