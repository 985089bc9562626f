package graft.functions

import java.util.regex.Pattern
import java.util.concurrent.ConcurrentHashMap

/** Parse-time numeric normalization and sink-side type coercion — behavioral
  * parity with the reference (SURVEY.md §1.2 / §2.2 T2+T8):
  * `normalizeNumerics` from `/root/reference/Wrap/File.pm:427-434`, the
  * numeric/bool/datetime coercion battery from
  * `/root/reference/Wrap/DB.pm:238-312`. Pure string functions (no Spark
  * dependency); Column wrappers in [[EtlFunctions]].
  *
  * All patterns are precompiled (these run per-field on the ingest hot
  * path — `String.matches` would recompile per call).
  */
object Coerce {

  // ---- normalizeNumerics --------------------------------------------------
  private case class SepPatterns(grouped: Pattern, plainDec: Pattern, sciDec: Pattern,
                                 thousandAll: Pattern, decimalOne: Pattern)
  private val sepCache = new ConcurrentHashMap[(String, String), SepPatterns]()
  private def sepPatterns(t: String, d: String): SepPatterns =
    sepCache.computeIfAbsent((t, d), { case (ts, ds) =>
      val tq = Pattern.quote(ts); val dq = Pattern.quote(ds)
      SepPatterns(
        grouped = Pattern.compile(s"-?\\d{1,3}($tq\\d{3})+($dq\\d*)?"),
        plainDec = Pattern.compile(s"-?\\d+$dq\\d+"),
        sciDec = Pattern.compile(s"-*\\d*$dq?\\d+E*[-+]*\\d*"),
        thousandAll = Pattern.compile(tq),
        decimalOne = Pattern.compile(dq))
    })

  /** Locale-aware numeric normalization (`Wrap/File.pm:427-434`): remove
    * thousand separators when the string is a fully-grouped numeral, then
    * rewrite the decimal separator to '.' when the string is a plain or
    * scientific numeral. Non-numeric shapes pass through untouched.
    * Defaults: thousand ',', decimal '.' (`Wrap/File.pm:445`). */
  def normalizeNumerics(s0: String, thousandSep: String = ",", decimalSep: String = "."): String = {
    if (s0 == null) return null
    // fast path: with neither separator present every rewrite below is a
    // no-op (grouped needs a thousand sep; the decimal rewrite replaces a
    // decimal sep) — skip the regex battery entirely
    if (s0.indexOf(thousandSep) < 0 && s0.indexOf(decimalSep) < 0) return s0
    var s = s0
    val p = sepPatterns(thousandSep, decimalSep)
    if (p.grouped.matcher(s).matches())
      s = p.thousandAll.matcher(s).replaceAll("")
    if (decimalSep != ".") {
      if (p.plainDec.matcher(s).matches() || p.sciDec.matcher(s).matches())
        s = p.decimalOne.matcher(s).replaceFirst(".")
    }
    s
  }

  // ---- numeric ------------------------------------------------------------
  private val trailingZeros = Pattern.compile(".*\\d+\\.0+")
  private val trailingZerosStrip = Pattern.compile("\\.0+$")
  private val postfixMinus = Pattern.compile("[\\d.]*-")
  private val postfixMinusSwap = Pattern.compile("([\\d.]*)-")
  private val percent = Pattern.compile("[\\d.]*%")
  private val numericShape = Pattern.compile("-*\\d*\\.?\\d+E*[-+]*\\d*")

  /** Numeric coercion battery (`Wrap/DB.pm:244-256`): strip trailing ".0+",
    * SAP postfix minus `123-` → `-123`, strip trailing '%', reject
    * non-numeric shapes and "N/A" (→ None), flush subnormals (≤1.79E-308)
    * to 0.
    *
    * Implemented as single-pass character scans (shape-classify, then
    * dispatch) rather than the reference's regex cascade — this runs
    * per-field on every load, so the per-row constant matters at scale.
    * [[coerceNumericRegex]] keeps the literal regex transcription; a
    * differential property test in CoerceSpec pins the two equal. */
  def coerceNumeric(s0: String): Option[Double] = {
    if (s0 == null) return None
    val n = s0.length
    // pass 1: digit presence (every accepting shape requires \d+) and the
    // plain optionally-negative integer fast path (takes no rewrites)
    var hasDigit = false
    var pureInt = n > 0 && n <= 16
    var i = 0
    while (i < n) {
      val c = s0.charAt(i)
      val digit = c >= '0' && c <= '9'
      hasDigit |= digit
      pureInt &&= digit || (i == 0 && c == '-' && n > 1)
      i += 1
    }
    if (!hasDigit) return None
    if (pureInt) return Some(s0.toDouble)
    var s = s0
    // ".*\d+\.0+$" → strip the "\.0+" tail: a run of '0's at the end,
    // preceded by '.', preceded by a digit
    var j = s.length - 1
    while (j >= 0 && s.charAt(j) == '0') j -= 1
    if (j < s.length - 1 && j >= 1 && s.charAt(j) == '.' && isDigit(s.charAt(j - 1)))
      s = s.substring(0, j)
    // "[\d.]*-$" → leading minus; "[\d.]*%$" → drop the percent sign
    val last = s.charAt(s.length - 1)
    if ((last == '-' || last == '%') && digitsDotsOnly(s, s.length - 1))
      s = if (last == '-') "-" + s.substring(0, s.length - 1)
          else s.substring(0, s.length - 1)
    // shape gate "-*\d*\.?\d+E*[-+]*\d*" as a hand-rolled scan (the regex
    // is the reference's, oddities included: any number of leading
    // minuses and 'E's — toDouble below rejects the nonsense ones)
    if (!numericShapeScan(s)) return None
    if (s == "N/A") return None
    val v = try s.toDouble catch { case _: NumberFormatException => return None }
    if (math.abs(v) <= 1.79e-308 && math.abs(v) > 0) Some(0.0) else Some(v)
  }

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def digitsDotsOnly(s: String, end: Int): Boolean = {
    var i = 0
    while (i < end) {
      val c = s.charAt(i)
      if (!(isDigit(c) || c == '.')) return false
      i += 1
    }
    true
  }

  /** Deterministic scan equivalent of `-*\d*\.?\d+E*[-+]*\d*` (full match).
    * The `\d*\.?\d+` core requires ≥1 digit after the dot when a dot is
    * taken, else ≥1 digit total. */
  private def numericShapeScan(s: String): Boolean = {
    val n = s.length
    var i = 0
    while (i < n && s.charAt(i) == '-') i += 1              // -*
    val intStart = i
    while (i < n && isDigit(s.charAt(i))) i += 1            // \d*
    val intDigits = i - intStart
    if (i < n && s.charAt(i) == '.') {                      // \.? \d+
      i += 1
      val fracStart = i
      while (i < n && isDigit(s.charAt(i))) i += 1
      if (i == fracStart) return false
    } else if (intDigits == 0) return false                 // bare \d+
    while (i < n && s.charAt(i) == 'E') i += 1              // E*
    while (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1 // [-+]*
    while (i < n && isDigit(s.charAt(i))) i += 1            // \d*
    i == n
  }

  /** Literal regex transcription of `Wrap/DB.pm:244-256` — the semantic
    * reference for [[coerceNumeric]]'s scan version; differential property
    * test in CoerceSpec. */
  private[graft] def coerceNumericRegex(s0: String): Option[Double] = {
    if (s0 == null) return None
    var s = s0
    if (trailingZeros.matcher(s).matches()) s = trailingZerosStrip.matcher(s).replaceAll("")
    if (postfixMinus.matcher(s).matches()) s = postfixMinusSwap.matcher(s).replaceFirst("-$1")
    if (percent.matcher(s).matches()) s = s.substring(0, s.length - 1)
    if (!numericShape.matcher(s).matches()) return None
    if (s == "N/A") return None
    val v = try s.toDouble catch { case _: NumberFormatException => return None }
    if (math.abs(v) <= 1.79e-308 && math.abs(v) > 0) Some(0.0) else Some(v)
  }

  /** Boolean coercion (`Wrap/DB.pm:258-262`): WAHR/TRUE → true,
    * FALSCH/FALSE → false (case-insensitive), plus bare 1/0; anything else
    * → None. */
  def coerceBool(s0: String): Option[Boolean] = {
    if (s0 == null) return None
    val s = s0.trim
    if (s.equalsIgnoreCase("WAHR") || s.equalsIgnoreCase("TRUE") || s == "1") Some(true)
    else if (s.equalsIgnoreCase("FALSCH") || s.equalsIgnoreCase("FALSE") || s == "0") Some(false)
    else None
  }

  // ---- datetime -----------------------------------------------------------
  private def p(re: String) = Pattern.compile(re)
  private val gate1 = p("^\\d{2}[./]*\\d{2}[./]*\\d{2,4}.*")
  private val gate2 = p("^\\d{4}-\\d{2}-\\d{2}.*")
  private val gate3 = p("^\\d{2}:\\d{2}:\\d{2}.*")
  private val dmyTime = p("^(\\d{2})[./](\\d{2})[./](\\d{4}) (\\d{2}):(\\d{2}):(\\d{2})")
  private val sap60 = p("^(\\d{4})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(60)")
  private val sapFull = p("^(\\d{4})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(\\d{2})")
  private val dmy = p("^(\\d{2})[./](\\d{2})[./](\\d{4})")
  private val ymd8 = p("^(\\d{4})(\\d{2})(\\d{2})")
  private val ymdDot = p("^(\\d{4})\\.(\\d{2})\\.(\\d{2})")
  private val shortYear = p("^(\\d{2})[./](\\d{2})[./](\\d{2})")
  private val zeroTime = p("^00:00:00$")
  private val zeroDate = p("^0000-00-00 00:00:00$")
  private val hms = p("^(\\d{2}):(\\d{2}):(\\d{2})")
  private val hms6 = p("^(\\d{2})(\\d{2})(\\d{2})")
  private val hmOnly = p("^(\\d{2}):(\\d{2})$")
  private val canonical = p("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$")
  private val canonicalDate = p("^\\d{4}-\\d{2}-\\d{2}$")
  private val digits8 = p("^\\d{8}.*")
  private val digits6 = p("^\\d{6}.*")
  private val digits14 = p("^\\d{14}.*")

  /** Date/time coercion cascade (`Wrap/DB.pm:264-301`), normalizing ≥12
    * input shapes to the ODBC canonical `YYYY-MM-DD hh:mm:ss`. Returns the
    * canonical STRING (the reference passes strings to ODBC); None mirrors
    * the reference's `undef` (with its severity-1 error channel). Rule
    * order is kept exactly; the reference's msec rule is an unreachable
    * no-op (replicated by omission) and so is its bare `HH:MM` rule (the
    * shape gate rejects it first).
    */
  def coerceDateTime(s0: String, cutoffYr2000: Int = 60): Option[String] = {
    if (s0 == null) return None
    var s = s0
    if (!(gate1.matcher(s).matches() || gate2.matcher(s).matches() || gate3.matcher(s).matches()))
      return None
    if (dmyTime.matcher(s).find())
      s = dmyTime.matcher(s).replaceFirst("$3-$2-$1 $4:$5:$6")
    if (digits14.matcher(s).matches()) {
      if (sap60.matcher(s).find()) s = sap60.matcher(s).replaceFirst("$1-$2-$3 $4:$5:59")
      if (sapFull.matcher(s).find()) s = sapFull.matcher(s).replaceFirst("$1-$2-$3 $4:$5:$6")
    }
    if (dmy.matcher(s).find()) s = dmy.matcher(s).replaceFirst("$3-$2-$1 00:00:00")
    if (digits8.matcher(s).matches()) s = ymd8.matcher(s).replaceFirst("$1-$2-$3 00:00:00")
    if (ymdDot.matcher(s).find()) s = ymdDot.matcher(s).replaceFirst("$1-$2-$3 00:00:00")
    val sy = shortYear.matcher(s)
    if (sy.find()) {
      val prefix = if (sy.group(3).toInt > cutoffYr2000) "19" else "20"
      s = shortYear.matcher(s).replaceFirst(s"$prefix$$3-$$2-$$1 00:00:00")
    }
    if (zeroTime.matcher(s).matches()) return None
    if (zeroDate.matcher(s).matches()) return None
    if (hms.matcher(s).find()) s = hms.matcher(s).replaceFirst("1900-01-01 $1:$2:$3")
    else if (digits6.matcher(s).matches()) s = hms6.matcher(s).replaceFirst("1900-01-01 $1:$2:$3")
    else if (hmOnly.matcher(s).matches()) s = hmOnly.matcher(s).replaceFirst("1900-01-01 $1:$2:00")
    if (s.startsWith("0")) return None
    if (!canonical.matcher(s).matches() && !canonicalDate.matcher(s).matches()) return None
    Some(s)
  }

  /** String coercion (`Wrap/DB.pm:304-310`): length check against the
    * declared size (severity-2 overflow → None here, error channel in the
    * sink), strip newlines. Quote-doubling is a SQL-literal artifact the
    * Spark engine doesn't need. */
  def coerceString(s0: String, maxLen: Int): Option[String] = {
    if (s0 == null) return None
    if (maxLen > 0 && s0.length > maxLen) return None
    Some(s0.replace("\n", ""))
  }
}
