package graft.pipeline

import graft.functions.DateUtil
import java.time.LocalDate

/** Execution gates evaluated before a load starts (`setupStarting`,
  * `Wrap/Common.pm:296-340`): holiday / weekend / first-business-day
  * skips. Pure functions of the (injected) date so the scheduler and tests
  * can evaluate them deterministically. A redo run bypasses every gate,
  * like the reference.
  */
object RunGates {

  sealed trait Decision
  case object Run extends Decision
  case class Skip(reason: String) extends Decision

  def evaluate(p: Config.ProcessConfig, today: LocalDate): Decision = {
    if (p.redoFile) return Run
    val ymd = DateUtil.fmt(today)
    // calendar resolution: explicit calendar, or "1" → configured default
    def cal(setting: String): String =
      if (setting == "1") p.holidaysDefault else setting

    val holidayCal =
      if (p.skipForFirstBusinessDate.nonEmpty) cal(p.skipForFirstBusinessDate)
      else if (p.skipHolidays.nonEmpty) cal(p.skipHolidays)
      else ""

    if (holidayCal.nonEmpty && DateUtil.isHoliday(holidayCal, ymd))
      return Skip(s"$ymd is a holiday in $holidayCal")
    if ((p.skipWeekends || p.skipForFirstBusinessDate.nonEmpty) && DateUtil.isWeekend(ymd))
      return Skip(s"$ymd is a weekend day")
    if (p.skipForFirstBusinessDate.nonEmpty) {
      // skip unless every day since the 1st was a non-business day
      // (`Wrap/Common.pm:325-335`)
      val daysFrom1st = today.getDayOfMonth - 1
      val nonBusiness = (1 to daysFrom1st).count { d =>
        val prev = DateUtil.fmt(today.minusDays(d.toLong))
        DateUtil.isWeekend(prev) || DateUtil.isHoliday(holidayCal, prev)
      }
      if (nonBusiness < daysFrom1st)
        return Skip(s"a business day already occurred before $ymd this month")
    }
    Run
  }
}
