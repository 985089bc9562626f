package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Date/time scalar function library — behavioral parity with the
  * reference's `Wrap/DateUtil.pm` (SURVEY.md §2.6, F1–F12), re-expressed on
  * `java.time`. Pure Scala (no Spark dependency) so the golden tests ported
  * from `/root/reference/t/DateUtil.t` run without a session; Spark Column
  * wrappers live in [[DateFunctions]].
  *
  * Conventions carried over from the reference:
  *  - dates travel as `YYYYMMDD` strings;
  *  - `weekday` is 1=Sunday … 7=Saturday (`DateUtil.pm:120-123`);
  *  - holiday calendars: AT, BS, BF, TG, UK, WE (weekends only), NO (none)
  *    (`DateUtil.pm:134-171`);
  *  - `addMonths` rolls an invalid month-end *forward* into the next month
  *    (`DateUtil.pm:291-298`, golden `t/DateUtil.t:22`), unlike Spark's
  *    `add_months` which clamps;
  *  - `addDays` in the reference advances 25h per day (`DateUtil.pm:245`, a
  *    latent DST bug); we implement the documented intent (calendar days).
  */
object DateUtil {

  private val YMD = DateTimeFormatter.ofPattern("yyyyMMdd")

  val monthsEn = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  /** German three-letter months as in the reference (`DateUtil.pm:28`). */
  val monthsDe = Array("Jän", "Feb", "Mär", "Apr", "Mai", "Jun",
    "Jul", "Aug", "Sep", "Okt", "Nov", "Dez")
  /** `%monate` lookup table (`DateUtil.pm:10`): note "Jan" (not Jän) on the
    * parse side. */
  val monateToNum: Map[String, Int] =
    Map("Jan" -> 1, "Feb" -> 2, "Mär" -> 3, "Apr" -> 4, "Mai" -> 5, "Jun" -> 6,
      "Jul" -> 7, "Aug" -> 8, "Sep" -> 9, "Okt" -> 10, "Nov" -> 11, "Dez" -> 12)
  val monthsToNum: Map[String, Int] = monthsEn.zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  def parse(yyyymmdd: String): LocalDate = LocalDate.parse(yyyymmdd, YMD)
  def fmt(d: LocalDate): String = d.format(YMD)

  // --- F2: template formatter (`DateUtil.pm:24-50`) -----------------------
  /** Template: Y→4-digit year, M→2-digit month, D→2-digit day; MMM→English
    * month, mmm→German month (first occurrence each, like the reference's
    * single-substitution regexes). */
  def formatDate(y: Int, m: Int, d: Int, template: String = "YMD"): String = {
    val t = if (template == null || template.isEmpty) "YMD" else template
    // single-substitution semantics like the reference's regexes, but
    // index-based (this runs per row on the date-function hot path)
    def replaceFirstLiteral(s: String, find: String, rep: String): String = {
      val i = s.indexOf(find)
      if (i < 0) s else s.substring(0, i) + rep + s.substring(i + find.length)
    }
    var r = t
    val iMMM = r.indexOf("MMM"); val immm = r.indexOf("mmm")
    if (iMMM >= 0) r = r.substring(0, iMMM) + monthsEn(m - 1) + r.substring(iMMM + 3)
    else if (immm >= 0) r = r.substring(0, immm) + monthsDe(m - 1) + r.substring(immm + 3)
    else r = replaceFirstLiteral(r, "M", f"$m%02d")
    r = replaceFirstLiteral(r, "Y", f"$y%04d")
    replaceFirstLiteral(r, "D", f"$d%02d")
  }

  def formatDateFromYYYYMMDD(date: String, template: String = "YMD"): String = {
    val d = parse(date)
    formatDate(d.getYear, d.getMonthValue, d.getDayOfMonth, template)
  }

  // --- F1: now() formats (`DateUtil.pm:12-86`) ----------------------------
  def getCurdate(now: LocalDateTime): String = now.format(DateTimeFormatter.ofPattern("yyyyMMdd"))
  def getCurdatetime(now: LocalDateTime): String = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
  def getCurdateDot(now: LocalDateTime): String = now.format(DateTimeFormatter.ofPattern("dd.MM.yyyy"))
  def getCurdateDash(now: LocalDateTime): String = now.format(DateTimeFormatter.ofPattern("dd-MM-yyyy"))
  def getCurtime(now: LocalDateTime): String = now.format(DateTimeFormatter.ofPattern("HH:mm:ss"))
  def getCurtimeHHMM(now: LocalDateTime): String = now.format(DateTimeFormatter.ofPattern("HHmm"))
  def getCurdateGen(now: LocalDateTime, template: String = "YMD"): String =
    formatDate(now.getYear, now.getMonthValue, now.getDayOfMonth, template)

  /** F12 (`DateUtil.pm:61-76`): (optionally given date minus
    * `daysToSubtract`) + X years, in DD-MM-YYYY. */
  def curdateDashPlusXYears(years: Int, date: Option[String], daysToSubtract: Int = 0,
                            now: LocalDate = LocalDate.now()): String = {
    val base = date.map(parse).getOrElse(now).minusDays(daysToSubtract.toLong)
    f"${base.getDayOfMonth}%02d-${base.getMonthValue}%02d-${base.getYear + years}%04d"
  }

  // --- F8: weekday / month-edge predicates (`DateUtil.pm:88-132`) ---------
  /** 1=Sunday … 7=Saturday. */
  /** LocalDate core (parse-free) — the string APIs delegate here so
    * batch callers can parse once per row (EtlFunctions.dateProfileUdf). */
  def weekdayDate(d: LocalDate): Int = d.getDayOfWeek.getValue % 7 + 1
  def weekday(date: String): Int = weekdayDate(parse(date))
  def isWeekend(date: String): Boolean = { val w = weekday(date); w == 1 || w == 7 }
  def isFirstDayOfMonth(date: String): Boolean = parse(date).getDayOfMonth == 1
  def isLastDayOfMonth(date: String): Boolean = { val d = parse(date); d.getDayOfMonth == d.lengthOfMonth }
  /** Holiday-aware variant (`DateUtil.pm:93-104`): next business day under
    * `hol` falls in a different month. */
  def isLastDayOfMonth(date: String, hol: String): Boolean =
    parse(addDaysHol(date, 1, "YMD", hol)).getMonthValue != parse(date).getMonthValue
  def getLastDayOfMonth(date: String): String = {
    val d = parse(date); fmt(d.withDayOfMonth(d.lengthOfMonth))
  }

  // --- F7: holiday calendars (`DateUtil.pm:134-171`) ----------------------
  private val fixedHol: Map[String, Set[(Int, Int)]] = {
    // (day, month) pairs; the reference keys are sprintf("%02d%02d", d, m)
    val austrianCore = Set((1, 1), (6, 1), (1, 5), (15, 8), (26, 10), (1, 11),
      (8, 12), (25, 12), (26, 12))
    Map(
      "BS" -> (austrianCore + ((24, 12))),
      "BF" -> (austrianCore + ((24, 12))),
      "AT" -> austrianCore,
      "TG" -> Set((1, 1), (1, 5), (25, 12), (26, 12)),
      "UK" -> Set((1, 1), (25, 12), (26, 12)))
  }

  /** Easter Sunday via the reference's Gauss-style computation
    * (`DateUtil.pm:148-150`), kept formula-identical for parity. */
  def easterSunday(y: Int): LocalDate = {
    val dRaw = (((255 - 11 * (y % 19)) - 21) % 30) + 21
    val e = if (dRaw > 48) 1 else 0
    val off = dRaw + e + 6 - ((y + y / 4 + dRaw + e + 1) % 7)
    LocalDate.of(y, 3, 1).plusDays(off.toLong)
  }

  private val easterCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Set[LocalDate]]()

  private def easterHol(cal: String, y: Int): Set[LocalDate] =
    easterCache.computeIfAbsent((cal, y), { case (c, yr) => easterHol0(c, yr) })

  private def easterHol0(cal: String, y: Int): Set[LocalDate] = {
    val easter = easterSunday(y)
    val goodFriday = easter.minusDays(2)
    val easterMonday = easter.plusDays(1)
    val ascension = easter.plusDays(39)
    val whitMonday = easter.plusDays(50)
    val corpusChristi = easter.plusDays(60)
    cal match {
      case "BS" => Set(easterMonday, ascension, whitMonday, corpusChristi, goodFriday)
      case "BF" | "AT" => Set(easterMonday, ascension, whitMonday, corpusChristi)
      case "TG" | "UK" => Set(easterMonday, goodFriday)
      case _ => Set.empty
    }
  }

  val calendars: Set[String] = Set("WE", "BS", "BF", "AT", "TG", "UK")

  /** True if `date` is a holiday under calendar `hol` (weekends are NOT
    * holidays here — `is_holiday("WE", …)` is always false, matching
    * `DateUtil.pm:136`). Unknown calendars → false. */
  def isHoliday(hol: String, date: String): Boolean =
    isHolidayDate(hol, parse(date))

  /** Parse-free core of [[isHoliday]]. */
  def isHolidayDate(hol: String, d: LocalDate): Boolean = {
    if (hol == "WE" || hol == "NO" || !calendars.contains(hol)) return false
    val fixed = fixedHol(hol).contains((d.getDayOfMonth, d.getMonthValue))
    val easter = easterHol(hol, d.getYear).contains(d)
    // UK bank holidays: first Monday of May, last Monday of May & August
    // (`DateUtil.pm:164-165`)
    val special = hol == "UK" && (
      firstWeek(d.getDayOfMonth, d.getMonthValue, d.getYear, 1, 5) ||
      lastWeek(d.getDayOfMonth, d.getMonthValue, d.getYear, 1, 5) ||
      lastWeek(d.getDayOfMonth, d.getMonthValue, d.getYear, 1, 8))
    fixed || easter || special
  }

  // --- F8: first/last weekday-X of month (`DateUtil.pm:173-214`) ----------
  /** True if (d,m,y) is the FIRST weekday `day` (0=Sunday…6=Saturday) of
    * `month`. */
  def firstWeek(d: Int, m: Int, y: Int, day: Int, month: Int = 0): Boolean = {
    val mon = if (month == 0) m else month
    if (day < 0 || day > 6) return false
    val date = LocalDate.of(y, m, d)
    m == mon && d <= 7 && (date.getDayOfWeek.getValue % 7) == day
  }
  def firstWeekYYYYMMDD(date: String, day: Int, month: Int = 0): Boolean = {
    val d = parse(date); firstWeek(d.getDayOfMonth, d.getMonthValue, d.getYear, day, month)
  }
  /** True if (d,m,y) is the LAST weekday `day` of `month`. */
  def lastWeek(d: Int, m: Int, y: Int, day: Int, month: Int = 0): Boolean = {
    val mon = if (month == 0) m else month
    if (day < 0 || day > 6) return false
    val date = LocalDate.of(y, m, d)
    m == mon && (date.getDayOfWeek.getValue % 7) == day &&
      date.plusDays(7).getMonthValue != m
  }
  def lastWeekYYYYMMDD(date: String, day: Int, month: Int = 0): Boolean = {
    val d = parse(date); lastWeek(d.getDayOfMonth, d.getMonthValue, d.getYear, day, month)
  }

  // --- F4: format conversions (`DateUtil.pm:216-240, 368-377`) ------------
  private val convertDateRe = raw"(\d{4})[./](\d\d)[./](\d\d)".r
  private val convertMMMRe = raw"(\d{2})-(\w{3})-(\d{4})".r

  /** YYYY.MM.DD or YYYY/MM/DD → YYYYMMDD. */
  def convertDate(s: String): String = {
    convertDateRe.findFirstMatchIn(s) match {
      case Some(m) => f"${m.group(1).toInt}%04d${m.group(2).toInt}%02d${m.group(3).toInt}%02d"
      case None => "00000000"
    }
  }
  /** dd-MMM-yyyy (English months) → DD.MM.YYYY. */
  def convertDateFromMMM(s: String): String = {
    convertMMMRe.findFirstMatchIn(s) match {
      case Some(m) =>
        f"${m.group(1).toInt}%02d.${monthsToNum(m.group(2))}%02d.${m.group(3).toInt}%04d"
      case None => ""
    }
  }
  def convertDateToMMM(day: Int, mon: Int, year: Int): String =
    f"$day%02d-${monthsEn(mon - 1)}%3s-$year%04d"
  /** YYYYMMDD → DD.MM.YYYY (verbatim substring shuffle, `DateUtil.pm:237-240`). */
  def convertToDDMMYYYY(date: String): String =
    s"${date.substring(6, 8)}.${date.substring(4, 6)}.${date.substring(0, 4)}"

  // --- F5: calendar arithmetic (`DateUtil.pm:242-298`) --------------------
  def addDays(date: String, days: Int): String = fmt(parse(date).plusDays(days.toLong))
  /** dd-MMM-yyyy output like the reference's addDays (`DateUtil.pm:242-252`). */
  def addDaysMMM(date: String, days: Int): String = {
    val d = parse(date).plusDays(days.toLong)
    convertDateToMMM(d.getDayOfMonth, d.getMonthValue, d.getYear)
  }
  def subtractDays(date: String, days: Int): String = fmt(parse(date).minusDays(days.toLong))

  /** Months-add with the reference's roll-FORWARD on invalid month ends
    * (`DateUtil.pm:291-298`; golden: 20121030 + 16 → 20140302): Perl mktime
    * normalizes Feb 30 to Mar 2. Differs from Spark's clamping add_months. */
  /** Parse-free core of [[addMonthsRollForward]]. */
  def addMonthsRollForwardDate(d: LocalDate, months: Int): LocalDate = {
    val m0 = d.getYear * 12 + (d.getMonthValue - 1) + months
    val (y, m) = (Math.floorDiv(m0, 12), Math.floorMod(m0, 12) + 1)
    LocalDate.of(y, m, 1).plusDays((d.getDayOfMonth - 1).toLong) // mktime-style overflow
  }
  def addMonthsRollForward(date: String, months: Int, template: String = "YMD"): String = {
    val r = addMonthsRollForwardDate(parse(date), months)
    formatDate(r.getYear, r.getMonthValue, r.getDayOfMonth, template)
  }

  // --- F6: business-day shifts (`DateUtil.pm:261-289`) --------------------
  private def isNonBusiness(d: LocalDate, hol: String): Boolean = {
    val w = d.getDayOfWeek.getValue % 7 // 0=Sunday, 6=Saturday
    w == 0 || w == 6 || isHolidayDate(hol, d)
  }
  /** Parse-free core of [[addDaysHol]]. */
  def addDaysHolDate(d0: LocalDate, days: Int, hol0: String): LocalDate = {
    val hol = if (hol0 == null || hol0.isEmpty) "AT" else hol0
    var d = d0.plusDays(days.toLong)
    if (hol != "NO") while (isNonBusiness(d, hol)) d = d.plusDays(1)
    d
  }
  /** Add `days` calendar days, then keep stepping forward while on a weekend
    * or `hol`-calendar holiday ("NO" skips the stepping entirely). */
  def addDaysHol(date: String, days: Int, template: String = "YMD", hol0: String = "AT"): String = {
    val d = addDaysHolDate(parse(date), days, hol0)
    formatDate(d.getYear, d.getMonthValue, d.getDayOfMonth, template)
  }
  /** Same going backwards. */
  def subtractDaysHol(date: String, days: Int, template: String = "YMD", hol0: String = "AT"): String = {
    val hol = if (hol0 == null || hol0.isEmpty) "AT" else hol0
    var d = parse(date).minusDays(days.toLong)
    if (hol != "NO") while (isNonBusiness(d, hol)) d = d.minusDays(1)
    formatDate(d.getYear, d.getMonthValue, d.getDayOfMonth, template)
  }

  /** F10 (`DateUtil.pm:300-310`): previous day, or Friday when `today` is a
    * Monday (weekends only, no holidays). */
  def lastdateYYYYMMDD(today: LocalDate): String = {
    val back = if (today.getDayOfWeek.getValue % 7 == 1) 3 else 1
    fmt(today.minusDays(back.toLong))
  }
  def lastdateDDMMYYYY(today: LocalDate): String = {
    val d = parse(lastdateYYYYMMDD(today))
    f"${d.getDayOfMonth}%02d.${d.getMonthValue}%02d.${d.getYear}%04d"
  }

  // --- F9: date series (`DateUtil.pm:335-352`) ----------------------------
  /** Inclusive YYYYMMDD range; with a calendar, business days only. */
  def dateSeries(fromDate: String, toDate: String, hol: String = ""): Seq[String] = {
    val from = parse(fromDate); val to = parse(toDate)
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .filter(d => hol == null || hol.isEmpty || !isNonBusiness(d, hol))
      .map(fmt).toSeq
  }

  // --- F11: German number formats (`DateUtil.pm:312-333`) -----------------
  /** Perl-style numeric stringification (shortest repr, 15 sig digits). */
  private def perlNum(x: Double): String =
    if (x == x.floor && math.abs(x) < 1e15) x.toLong.toString
    else {
      val s = String.format(java.util.Locale.ROOT, "%.15g", Double.box(x))
      // strip trailing zeros of the significand like Perl's %g-based print
      if (s.contains('.') && !s.contains('e') && !s.contains('E'))
        s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else s
    }
  /** Decimal point → comma (optionally divide first). */
  def convertComma(x: Double, divideBy: Double = 0): String = {
    val v = if (divideBy != 0) x / divideBy else x
    perlNum(v).replaceFirst("\\.", ",")
  }
  /** German thousand-separated decimal: 123456789.12 → "123.456.789,12";
    * integers get ",0"; `ignoreDecimal` truncates (`DateUtil.pm:321-333`). */
  def convertToThousendDecimal(value: Double, ignoreDecimal: Boolean = false): String = {
    val s = perlNum(value)
    val (intP, decP) = s.indexOf('.') match {
      case -1 => (s, "0")
      case i  => (s.substring(0, i), s.substring(i + 1))
    }
    val grouped = intP.reverse.grouped(3).mkString(".").reverse
    if (ignoreDecimal) grouped else s"$grouped,$decP"
  }

  // --- F3: epoch parse/convert (`DateUtil.pm:354-377`) --------------------
  /** Epoch seconds of midnight at `zone`; "invalid date" sentinel → None.
    * Validity window matches the reference: year ≥ 1900, 1≤m≤12, 1≤d≤31
    * (day 31 of a 30-day month normalizes forward like Perl timelocal
    * would error — we reject only the reference's checks, then parse
    * leniently). */
  private val ddmmyyyyRe = raw"(.+)\.(.+)\.(\d{4})".r
  def parseFromDDMMYYYY(s: String, zone: ZoneId = ZoneOffset.UTC): Option[Long] = {
    s match {
      case ddmmyyyyRe(d, m, y) => epochIfValid(y, m, d, zone)
      case _ => None
    }
  }
  def parseFromYYYYMMDD(s: String, zone: ZoneId = ZoneOffset.UTC): Option[Long] =
    if (s == null || s.length < 8) None
    else epochIfValid(s.substring(0, 4), s.substring(4, 6), s.substring(6, 8), zone)

  private def epochIfValid(ys: String, ms: String, ds: String, zone: ZoneId): Option[Long] = {
    val (y, m, d) =
      try { (ys.trim.toInt, ms.trim.toInt, ds.trim.toInt) }
      catch { case _: NumberFormatException => return None }
    if (y < 1900 || m < 1 || m > 12 || d < 1 || d > 31) None
    else {
      // Perl timelocal normalizes day overflow (Apr 31 → May 1)
      val base = LocalDate.of(y, m, 1).plusDays((d - 1).toLong)
      Some(base.atStartOfDay(zone).toEpochSecond)
    }
  }

  def convertEpochToYYYYMMDD(epoch: Long, zone: ZoneId = ZoneOffset.UTC): String =
    fmt(java.time.Instant.ofEpochSecond(epoch).atZone(zone).toLocalDate)
}
