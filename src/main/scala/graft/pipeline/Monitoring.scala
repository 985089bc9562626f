package graft.pipeline

import graft.functions.DateUtil

/** Job-start monitoring (R6, reference `checkLogExist.pl:20-104`): each
  * configured job has a frequency spec deciding whether today's log must
  * contain a start entry, and a 3-date-format log scan. The alerting side
  * (mail) is an ops concern; these are the pure predicates it needs.
  *
  * Frequency specs: `B` business-daily (skip weekends/holidays), `D`
  * daily, `M1` first calendar day of month, `Q` quarter starts
  * (Jan 2 / Apr 1 / Jul 1 / Oct 1), `ML` last day of month, `W<n>` weekday
  * n (1=Sun..7=Sat), `MW<n>` first weekday-n of the month (0=Sun..6=Sat).
  */
object Monitoring {

  def frequencyDue(freq0: String, ymd: String, holidayCal: String = "AT"): Boolean = {
    val freq = if (freq0 == null || freq0.isEmpty) "B" else freq0
    freq match {
      case "B" => !(DateUtil.isWeekend(ymd) || DateUtil.isHoliday(holidayCal, ymd))
      case "D" => true
      case "M1" => ymd.endsWith("01")
      case "Q" =>
        val mmdd = ymd.substring(4)
        mmdd == "0102" || mmdd == "0401" || mmdd == "0701" || mmdd == "1001"
      case "ML" => DateUtil.isLastDayOfMonth(ymd)
      case w if w.length == 2 && w.charAt(0) == 'W' =>
        DateUtil.weekday(ymd) == (w.charAt(1) - '0')
      case mw if mw.length == 3 && mw.startsWith("MW") =>
        DateUtil.firstWeekYYYYMMDD(ymd, mw.charAt(2) - '0')
      case _ => false
    }
  }

  /** Scan log lines (tab-separated, date in the first field) for a start
    * entry: the first field must carry today's date in any of the three
    * accepted formats (DD-MM-YYYY, DD.MM.YYYY, YYYY-MM-DD) and the whole
    * line must match the job's `logcheck` regex. */
  def logHasStartEntry(lines: Iterator[String], ymd: String, logcheck: String): Boolean = {
    val d = DateUtil.parse(ymd)
    val dash = f"${d.getDayOfMonth}%02d-${d.getMonthValue}%02d-${d.getYear}%04d"
    val dot = f"${d.getDayOfMonth}%02d.${d.getMonthValue}%02d.${d.getYear}%04d"
    val iso = f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
    val re = logcheck.r
    lines.exists { line =>
      val first = line.split("\t", 2).head
      (first.contains(dash) || first.contains(dot) || first.contains(iso)) &&
        re.findFirstIn(line).isDefined
    }
  }

  // ---- alert delivery (checkLogExist.pl:96-103, Common.pm:410+) --------

  /** One monitored job — the reference's `checkLookup{script}` entry
    * (`Wrap/Common.pm:29`): frequency spec, start-entry regex, and the
    * alert routing fields. */
  case class JobCheck(name: String, freq: String, logcheck: String,
                      errmailaddress: String = "", errmailsubject: String = "")

  case class Alert(job: String, ymd: String, recipient: String,
                   subject: String, message: String)

  /** Delivery SPI. The reference mails via MIME::Lite — transport is
    * deployment-specific (no network here), so delivery is pluggable;
    * [[FileAlertSink]] writes a durable JSONL feed an ops mailer tails. */
  trait AlertSink { def deliver(alert: Alert): Unit }

  final class FileAlertSink(path: java.nio.file.Path) extends AlertSink {
    private def esc(s: String) =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    def deliver(a: Alert): Unit = {
      val line = s"""{"job":"${esc(a.job)}","ymd":"${esc(a.ymd)}",""" +
        s""""recipient":"${esc(a.recipient)}","subject":"${esc(a.subject)}",""" +
        s""""message":"${esc(a.message)}"}""" + "\n"
      java.nio.file.Files.write(path, line.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** The `checkLogExist` main loop: for every configured job whose
    * frequency is due on `ymd`, scan its log for a start entry and alert
    * when missing. Returns the alerts raised. */
  def checkJobs(jobs: Seq[JobCheck], ymd: String,
                logLines: String => Iterator[String], sink: AlertSink,
                holidayCal: String = "AT"): Seq[Alert] =
    jobs.flatMap { j =>
      if (!frequencyDue(j.freq, ymd, holidayCal)) None
      else if (logHasStartEntry(logLines(j.name), ymd, j.logcheck)) None
      else {
        val recipient = if (j.errmailaddress.nonEmpty) j.errmailaddress else "ops"
        val subject = if (j.errmailsubject.nonEmpty) j.errmailsubject
                      else s"job ${j.name} did not start"
        val a = Alert(j.name, ymd, recipient, subject,
          s"no start entry for ${j.name} on $ymd (freq ${j.freq})")
        sink.deliver(a)
        Some(a)
      }
    }
}
