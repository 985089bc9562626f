package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DateUtil._
import java.time.ZoneId

/** Golden-value parity suite ported from the reference's
  * `/root/reference/t/DateUtil.t` (171 assertions). Volatile now()-based
  * functions are tested with injected clocks instead of regex shapes.
  */
class DateUtilSpec extends AnyFunSuite {

  private val vienna = ZoneId.of("Europe/Vienna")

  test("get_dateseries with AT calendar (t:5-6)") {
    val expected = Seq("20150102", "20150105", "20150107", "20150108", "20150109",
      "20150112", "20150113", "20150114", "20150115", "20150116", "20150119",
      "20150120", "20150121", "20150122", "20150123", "20150126", "20150127",
      "20150128", "20150129", "20150130", "20150202", "20150203", "20150204",
      "20150205", "20150206", "20150209", "20150210", "20150211", "20150212",
      "20150213", "20150216", "20150217", "20150218", "20150219", "20150220",
      "20150223", "20150224", "20150225", "20150226", "20150227", "20150302")
    assert(dateSeries("20150102", "20150302", "AT") == expected)
  }

  test("is_weekend (t:7-10)") {
    assert(!isWeekend("20150102")); assert(isWeekend("20150103"))
    assert(isWeekend("20150104")); assert(!isWeekend("20150105"))
  }

  test("weekday 1=Sun..7=Sat (t:11-17)") {
    assert(weekday("20180801") == 4); assert(weekday("20180802") == 5)
    assert(weekday("20180803") == 6); assert(weekday("20180804") == 7)
    assert(weekday("20180805") == 1); assert(weekday("20180806") == 2)
    assert(weekday("20180807") == 3)
  }

  test("addMonths roll-forward (t:18-22)") {
    assert(addMonthsRollForward("20121030", 1) == "20121130")
    assert(addMonthsRollForward("20121030", 3) == "20130130")
    assert(addMonthsRollForward("20121030", 13) == "20131130")
    assert(addMonthsRollForward("20121030", 14) == "20131230")
    assert(addMonthsRollForward("20121030", 16) == "20140302") // not 20140230!
  }

  test("addDaysHol default AT (t:23-30)") {
    assert(addDaysHol("20111231", 1) == "20120102")
    assert(addDaysHol("20120105", 1) == "20120109")
    assert(addDaysHol("20120430", 1) == "20120502")
    assert(addDaysHol("20120814", 1) == "20120816")
    assert(addDaysHol("20121025", 1) == "20121029")
    assert(addDaysHol("20121031", 1) == "20121102")
    assert(addDaysHol("20121207", 1) == "20121210")
    assert(addDaysHol("20121224", 1) == "20121227")
  }

  test("addDaysHol WE / NO calendars (t:31-32)") {
    assert(addDaysHol("20121224", 1, "YMD", "WE") == "20121225")
    assert(addDaysHol("20220429", 1, "YMD", "NO") == "20220430")
  }

  test("addDaysHol with templates (t:33-38)") {
    assert(addDaysHol("20120405", 1, "D.M.Y") == "06.04.2012")
    assert(addDaysHol("20120408", 1, "D-M-Y") == "10-04-2012")
    assert(addDaysHol("20120516", 1, "Y-M-D") == "2012-05-18")
    assert(addDaysHol("20120527", 1, "D-MMM-Y") == "29-May-2012")
    assert(addDaysHol("20120606", 1, "D/M/Y") == "08/06/2012")
    assert(addDaysHol("20121224", 1, "D.mmm.Y") == "27.Dez.2012")
  }

  test("subtractDaysHol (t:39-43)") {
    assert(subtractDaysHol("20120102", 1) == "20111230")
    assert(subtractDaysHol("20120502", 1) == "20120430")
    assert(subtractDaysHol("20121224", 1, "YMD", "WE") == "20121221")
    assert(subtractDaysHol("20220502", 1, "YMD", "NO") == "20220501")
    assert(subtractDaysHol("20191227", 1, "YMD", "BF") == "20191223")
  }

  test("BF christmas-window holidays (t:44-49)") {
    assert(isHoliday("BF", subtractDaysHol("20191227", 1, "YMD", "WE")))
    assert(isHoliday("BF", subtractDaysHol("20191226", 1, "YMD", "WE")))
    assert(isHoliday("BF", subtractDaysHol("20191225", 1, "YMD", "WE")))
    assert(!isHoliday("BF", subtractDaysHol("20191224", 1, "YMD", "WE")))
    assert(!isHoliday("BF", subtractDaysHol("20191223", 1, "YMD", "WE")))
    assert(!isHoliday("BF", subtractDaysHol("20191209", 1, "YMD", "WE")))
  }

  test("addDays dd-MMM-yyyy (t:50-54)") {
    assert(addDaysMMM("20070101", 1) == "02-Jan-2007")
  }

  test("first_week / last_week (t:56-74, 122-126)") {
    assert(firstWeek(7, 5, 2018, 1, 5))
    assert(firstWeekYYYYMMDD("20180507", 1, 5))
    assert(firstWeekYYYYMMDD("20210105", 2))
    assert(firstWeekYYYYMMDD("20210106", 3))
    assert(firstWeekYYYYMMDD("20210107", 4))
    assert(firstWeekYYYYMMDD("20210101", 5))
    assert(firstWeekYYYYMMDD("20210102", 6))
    assert(firstWeekYYYYMMDD("20210103", 0))
    assert(firstWeekYYYYMMDD("20180507", 1))
    assert(lastWeek(28, 5, 2018, 1, 5))
    assert(lastWeek(27, 8, 2018, 1, 8))
    assert(lastWeek(28, 12, 2018, 5, 12))
    assert(lastWeekYYYYMMDD("20181228", 5, 12))
    assert(lastWeekYYYYMMDD("20181228", 5))
    assert(firstWeek(7, 1, 2018, 0, 1))
    assert(firstWeek(6, 5, 2019, 1, 5))
    assert(!firstWeek(7, 5, 2019, 1, 5))
    assert(!firstWeek(13, 5, 2019, 1, 5))
    assert(lastWeek(27, 5, 2019, 1, 5))
    assert(!lastWeek(10, 5, 2019, 1, 5))
  }

  test("is_holiday common goldens across calendars (t:75-80)") {
    for (cal <- Seq("BS", "BF", "AT", "TG", "UK")) {
      assert(isHoliday(cal, "20180101"), cal)
      assert(isHoliday(cal, "20181225"), cal)
      assert(isHoliday(cal, "20181226"), cal)
      assert(!isHoliday(cal, "20180502"), cal)
    }
  }

  test("is_holiday AT incl. Easter-derived (t:81-97, 111)") {
    assert(isHoliday("AT", "20120101")) // new year
    assert(isHoliday("AT", "20120106")) // epiphany
    assert(isHoliday("AT", "20120409")) // easter monday
    assert(isHoliday("AT", "20120501")) // may day
    assert(isHoliday("AT", "20120517")) // ascension
    assert(isHoliday("AT", "20120528")) // whit monday
    assert(isHoliday("AT", "20120607")) // corpus christi
    assert(isHoliday("AT", "20120815")) // assumption
    assert(isHoliday("AT", "20121026")) // national day
    assert(isHoliday("AT", "20121101")) // all saints
    assert(isHoliday("AT", "20121208")) // mary conception
    assert(!isHoliday("AT", "20121224")) // christmas eve not AT
    assert(isHoliday("AT", "20121225"))
    assert(isHoliday("AT", "20121226"))
    assert(!isHoliday("AT", "20120406")) // good friday not AT
    assert(isHoliday("BS", "20120406")) // good friday BS
    assert(!isHoliday("BF", "20120406")) // good friday not BF
    assert(isHoliday("AT", "20210405")) // easter monday 2021
  }

  test("is_holiday UK / TG specialties (t:100-110)") {
    assert(isHoliday("UK", "20180507")) // may day
    assert(isHoliday("UK", "20180528")) // spring bank holiday
    assert(isHoliday("UK", "20180827")) // summer bank holiday
    assert(!isHoliday("UK", "20180501"))
    assert(!isHoliday("TG", "20180507"))
    assert(!isHoliday("TG", "20180528"))
    assert(!isHoliday("TG", "20180827"))
    assert(isHoliday("TG", "20180101"))
    assert(isHoliday("TG", "20180501"))
    assert(isHoliday("TG", "20181225"))
    assert(isHoliday("TG", "20181226"))
  }

  test("first/last day of month (t:112-121)") {
    assert(isFirstDayOfMonth("20190101")); assert(!isFirstDayOfMonth("20190102"))
    assert(isLastDayOfMonth("20190131")); assert(!isLastDayOfMonth("20190130"))
    assert(isLastDayOfMonth("20190228")); assert(isLastDayOfMonth("20200229"))
    assert(!isLastDayOfMonth("20200228"))
    assert(isLastDayOfMonth("20220429", "WE")) // Friday before weekend-end
    assert(!isLastDayOfMonth("20220428", "WE"))
  }

  test("formatDate templates (t:130-133)") {
    assert(formatDate(2019, 1, 1, "D.M.Y") == "01.01.2019")
    assert(formatDate(2019, 3, 1, "D.MMM.Y") == "01.Mar.2019")
    assert(formatDate(2019, 3, 1, "D.mmm.Y") == "01.Mär.2019")
    assert(formatDateFromYYYYMMDD("20190101", "D.M.Y") == "01.01.2019")
  }

  test("get_curdate_dash_plus_X_years (t:134-135)") {
    assert(curdateDashPlusXYears(100, Some("20190101")) == "01-01-2119")
    assert(curdateDashPlusXYears(100, Some("20190105"), 4) == "01-01-2119")
  }

  test("convertToThousendDecimal / convertcomma (t:150-154)") {
    assert(convertToThousendDecimal(123456789.12) == "123.456.789,12")
    assert(convertToThousendDecimal(123456789) == "123.456.789,0")
    assert(convertToThousendDecimal(0) == "0,0")
    assert(convertToThousendDecimal(0, ignoreDecimal = true) == "0")
    assert(convertToThousendDecimal(12345.20, ignoreDecimal = true) == "12.345")
    assert(convertComma(1.5) == "1,5")
    assert(convertComma(3.0, 2) == "1,5")
  }

  test("parseFrom* epoch + sentinels (t:155-165, Vienna clock)") {
    assert(parseFromDDMMYYYY("01.01.1970", vienna).contains(-3600L))
    assert(parseFromDDMMYYYY("02.01.1970", vienna).contains(-3600L + 86400L))
    assert(parseFromYYYYMMDD("19700102", vienna).contains(-3600L + 86400L))
    assert((parseFromYYYYMMDD("19700103", vienna).get -
            parseFromYYYYMMDD("19700101", vienna).get) / 86400 == 2)
    assert((parseFromYYYYMMDD("20191104", vienna).get -
            parseFromDDMMYYYY("01.11.2019", vienna).get) / 86400 == 3)
    assert(parseFromYYYYMMDD("19000100", vienna).isEmpty)
    assert(parseFromDDMMYYYY("01.13.2001", vienna).isEmpty)
    assert(parseFromYYYYMMDD("", vienna).isEmpty)
    assert(parseFromDDMMYYYY("01.01.1801", vienna).isEmpty)
    assert(parseFromYYYYMMDD("20010132", vienna).isEmpty)
    assert(parseFromDDMMYYYY("00.01.1901", vienna).isEmpty)
  }

  test("convertEpochToYYYYMMDD roundtrip (t:166-167)") {
    assert(convertEpochToYYYYMMDD(parseFromYYYYMMDD("20010131", vienna).get, vienna) == "20010131")
  }

  test("get_last_day_of_month (t:168-171)") {
    assert(getLastDayOfMonth("20011215") == "20011231")
    assert(getLastDayOfMonth("20010115") == "20010131")
    assert(getLastDayOfMonth("20010215") == "20010228")
    assert(getLastDayOfMonth("20040215") == "20040229")
  }

  test("convertDate / convertDateFromMMM / convertToDDMMYYYY") {
    assert(convertDate("2019.01.31") == "20190131")
    assert(convertDate("2019/01/31") == "20190131")
    assert(convertDateFromMMM("01-Oct-2005") == "01.10.2005")
    assert(convertDateToMMM(1, 10, 2005) == "01-Oct-2005")
    assert(convertToDDMMYYYY("20190131") == "31.01.2019")
  }

  test("lastdate weekends-only (Mon → Fri)") {
    assert(lastdateYYYYMMDD(java.time.LocalDate.of(2024, 7, 8)) == "20240705") // Monday
    assert(lastdateYYYYMMDD(java.time.LocalDate.of(2024, 7, 10)) == "20240709")
    assert(lastdateDDMMYYYY(java.time.LocalDate.of(2024, 7, 8)) == "05.07.2024")
  }
}
