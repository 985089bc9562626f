package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Spark-callable surface of the scalar function library (SURVEY.md §2.6):
  * Column API + SQL registration for [[DateUtil]] and [[Coerce]].
  *
  * These are JVM UDFs: columnar-codegen boundaries, but cheap per-row string
  * work; all are deterministic so Catalyst can still prune/pushdown around
  * them. The ingest-hot-path normalizers (`normalizeNumerics`, coercions)
  * are candidates for native `Expression`s if profiling shows UDF overhead
  * at scale.
  */
object EtlFunctions {

  // ---- date functions -----------------------------------------------------
  val weekdayUdf = udf((d: String) => DateUtil.weekday(d))
  val isWeekendUdf = udf((d: String) => DateUtil.isWeekend(d))
  val isHolidayUdf = udf((cal: String, d: String) => DateUtil.isHoliday(cal, d))
  val addDaysHolUdf = udf((d: String, n: Int, tpl: String, cal: String) =>
    DateUtil.addDaysHol(d, n, tpl, cal))
  val subDaysHolUdf = udf((d: String, n: Int, tpl: String, cal: String) =>
    DateUtil.subtractDaysHol(d, n, tpl, cal))
  val addMonthsRollUdf = udf((d: String, n: Int) => DateUtil.addMonthsRollForward(d, n))
  val lastDomUdf = udf((d: String) => DateUtil.getLastDayOfMonth(d))
  val formatDateUdf = udf((d: String, tpl: String) => DateUtil.formatDateFromYYYYMMDD(d, tpl))
  val dateSeriesUdf = udf((from: String, to: String, cal: String) =>
    DateUtil.dateSeries(from, to, cal))
  val convertDateUdf = udf((s: String) => DateUtil.convertDate(s))
  val thousendDecimalUdf = udf((x: Double, ignoreDec: Boolean) =>
    DateUtil.convertToThousendDecimal(x, ignoreDec))
  val convertCommaUdf = udf((x: Double, div: Double) => DateUtil.convertComma(x, div))

  /** Batch date-enrichment profile: everything a load typically derives
    * from one date, computed with ONE string parse and one UDF boundary
    * per row (the individual UDFs above parse per call — fine for ad-hoc
    * use, 6× the work when a load wants all of them). */
  case class DateProfile(wd: Long, weekend: Boolean, holiday: Boolean,
                         next_bd: String, last_dom: String, month_roll: String)
  val dateProfileUdf = udf((ymd: String, cal: String) => {
    val d = DateUtil.parse(ymd)
    val wd = DateUtil.weekdayDate(d)
    val bd = DateUtil.addDaysHolDate(d, 1, cal)
    val roll = DateUtil.addMonthsRollForwardDate(d, 1)
    DateProfile(
      wd.toLong, wd == 1 || wd == 7, DateUtil.isHolidayDate(cal, d),
      DateUtil.formatDate(bd.getYear, bd.getMonthValue, bd.getDayOfMonth),
      DateUtil.fmt(d.withDayOfMonth(d.lengthOfMonth)),
      DateUtil.formatDate(roll.getYear, roll.getMonthValue, roll.getDayOfMonth))
  })

  // ---- coercions ----------------------------------------------------------
  val normalizeNumericsUdf = udf((s: String, t: String, d: String) =>
    Coerce.normalizeNumerics(s, t, d))
  val coerceNumericUdf = udf((s: String) => Coerce.coerceNumeric(s))
  val coerceBoolUdf = udf((s: String) => Coerce.coerceBool(s))
  val coerceDateTimeUdf = udf((s: String) => Coerce.coerceDateTime(s))

  def normalize_numerics(c: Column, thousandSep: String = ",", decimalSep: String = "."): Column =
    normalizeNumericsUdf(c, org.apache.spark.sql.functions.lit(thousandSep),
      org.apache.spark.sql.functions.lit(decimalSep))
  def coerce_numeric(c: Column): Column = coerceNumericUdf(c)
  def coerce_bool(c: Column): Column = coerceBoolUdf(c)
  def coerce_datetime(c: Column): Column = coerceDateTimeUdf(c)

  /** Register everything for `spark.sql` users. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_weekday", weekdayUdf)
    spark.udf.register("graft_is_weekend", isWeekendUdf)
    spark.udf.register("graft_is_holiday", isHolidayUdf)
    spark.udf.register("graft_add_days_hol", addDaysHolUdf)
    spark.udf.register("graft_sub_days_hol", subDaysHolUdf)
    spark.udf.register("graft_add_months_roll", addMonthsRollUdf)
    spark.udf.register("graft_last_dom", lastDomUdf)
    spark.udf.register("graft_format_date", formatDateUdf)
    spark.udf.register("graft_dateseries", dateSeriesUdf)
    spark.udf.register("graft_convert_date", convertDateUdf)
    spark.udf.register("graft_thousend_decimal", thousendDecimalUdf)
    spark.udf.register("graft_convert_comma", convertCommaUdf)
    spark.udf.register("graft_normalize_numerics", normalizeNumericsUdf)
    spark.udf.register("graft_coerce_numeric", coerceNumericUdf)
    spark.udf.register("graft_coerce_bool", coerceBoolUdf)
    spark.udf.register("graft_coerce_datetime", coerceDateTimeUdf)
  }
}
