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
}
