package graft.functions

/** Parse-time numeric normalization and sink-side type coercion — behavioral
  * parity with the reference (SURVEY.md §1.2 / §2.2 T2+T8):
  * `normalizeNumerics` from `/root/reference/Wrap/File.pm:427-434`, the
  * numeric/bool/datetime coercion battery from
  * `/root/reference/Wrap/DB.pm:238-312`. Pure string functions (no Spark
  * dependency); Column wrappers in [[EtlFunctions]].
  */
object Coerce {

  /** Locale-aware numeric normalization (`Wrap/File.pm:427-434`): remove
    * thousand separators when the string is a fully-grouped numeral, then
    * rewrite the decimal separator to '.' when the string is a plain or
    * scientific numeral. Non-numeric shapes pass through untouched.
    * Defaults: thousand ',', decimal '.' (`Wrap/File.pm:445`).
    */
  def normalizeNumerics(s0: String, thousandSep: String = ",", decimalSep: String = "."): String = {
    if (s0 == null) return null
    var s = s0
    val t = java.util.regex.Pattern.quote(thousandSep)
    val d = java.util.regex.Pattern.quote(decimalSep)
    if (s.matches(s"-?\\d{1,3}($t\\d{3})+($d\\d*)?"))
      s = s.replaceAll(t, "")
    if (decimalSep != ".") {
      if (s.matches(s"-?\\d+$d\\d+") || s.matches(s"-*\\d*$d?\\d+E*[-+]*\\d*"))
        s = s.replaceFirst(d, ".")
    }
    s
  }

  /** Numeric coercion battery (`Wrap/DB.pm:244-256`): strip trailing ".0+",
    * SAP postfix minus `123-` → `-123`, strip trailing '%', reject
    * non-numeric shapes and "N/A" (→ None), flush subnormals (≤1.79E-308)
    * to 0. */
  def coerceNumeric(s0: String): Option[Double] = {
    if (s0 == null) return None
    var s = s0
    if (s.matches(".*\\d+\\.0+")) s = s.replaceAll("\\.0+$", "")
    if (s.matches("[\\d.]*-")) s = s.replaceFirst("([\\d.]*)-", "-$1")
    if (s.matches("[\\d.]*%")) s = s.replaceFirst("%$", "")
    if (!s.matches("-*\\d*\\.?\\d+E*[-+]*\\d*")) return None
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

  /** Date/time coercion cascade (`Wrap/DB.pm:264-301`), normalizing ≥12
    * input shapes to the ODBC canonical `YYYY-MM-DD hh:mm:ss`. Returns the
    * canonical STRING (the reference passes strings to ODBC); None mirrors
    * the reference's `undef` (with its severity-1 error channel).
    *
    * Rule order matters and is kept exactly:
    *  1. shape gate; 2. `DD[./]MM[./]YYYY hh:mm:ss`; 3. (reference's msec
    *  rule is an unreachable no-op — replicated by omission, msec inputs
    *  fall through to the final check and become None);
    *  4. SAP `...mmss=60` fudge → :59; 5. `YYYYMMDDHHMMSS`;
    *  6. `DD[./]MM[./]YYYY` → midnight; 7. `YYYYMMDD...` → midnight;
    *  8. `YYYY.MM.DD`; 9. 2-digit year with `cutoffYr2000` pivot
    *  (default 60, `Wrap/Common.pm:83`); 10. zero date/time → None;
    *  11-13. bare times → 1900-01-01; 14. leading-zero year → None;
    *  15. final canonical-shape check.
    */
  def coerceDateTime(s0: String, cutoffYr2000: Int = 60): Option[String] = {
    if (s0 == null) return None
    var s = s0
    val gate = s.matches("^\\d{2}[./]*\\d{2}[./]*\\d{2,4}.*") ||
      s.matches("^\\d{4}-\\d{2}-\\d{2}.*") ||
      s.matches("^\\d{2}:\\d{2}:\\d{2}.*")
    if (!gate) return None
    if (s.matches("^\\d{2}[./]\\d{2}[./]\\d{4} \\d{2}:\\d{2}:\\d{2}.*"))
      s = s.replaceFirst("^(\\d{2})[./](\\d{2})[./](\\d{4}) (\\d{2}):(\\d{2}):(\\d{2})", "$3-$2-$1 $4:$5:$6")
    if (s.matches("^\\d{4}\\d{2}\\d{2}\\d{2}\\d{2}60.*"))
      s = s.replaceFirst("^(\\d{4})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(60)", "$1-$2-$3 $4:$5:59")
    if (s.matches("^\\d{4}\\d{2}\\d{2}\\d{2}\\d{2}\\d{2}.*"))
      s = s.replaceFirst("^(\\d{4})(\\d{2})(\\d{2})(\\d{2})(\\d{2})(\\d{2})", "$1-$2-$3 $4:$5:$6")
    if (s.matches("^\\d{2}[./]\\d{2}[./]\\d{4}.*"))
      s = s.replaceFirst("^(\\d{2})[./](\\d{2})[./](\\d{4})", "$3-$2-$1 00:00:00")
    if (s.matches("^\\d{8}.*"))
      s = s.replaceFirst("^(\\d{4})(\\d{2})(\\d{2})", "$1-$2-$3 00:00:00")
    if (s.matches("^\\d{4}\\.\\d{2}\\.\\d{2}.*"))
      s = s.replaceFirst("^(\\d{4})\\.(\\d{2})\\.(\\d{2})", "$1-$2-$3 00:00:00")
    val shortYear = "^(\\d{2})[./](\\d{2})[./](\\d{2})".r
    shortYear.findFirstMatchIn(s).foreach { m =>
      val prefix = if (m.group(3).toInt > cutoffYr2000) "19" else "20"
      s = s.replaceFirst("^(\\d{2})[./](\\d{2})[./](\\d{2})", s"$prefix$$3-$$2-$$1 00:00:00")
    }
    if (s.matches("^00:00:00$")) return None
    if (s.matches("^0000-00-00 00:00:00$")) return None
    if (s.matches("^\\d{2}:\\d{2}:\\d{2}.*"))
      s = s.replaceFirst("^(\\d{2}):(\\d{2}):(\\d{2})", "1900-01-01 $1:$2:$3")
    else if (s.matches("^\\d{6}.*"))
      s = s.replaceFirst("^(\\d{2})(\\d{2})(\\d{2})", "1900-01-01 $1:$2:$3")
    else if (s.matches("^\\d{2}:\\d{2}$"))
      s = s.replaceFirst("^(\\d{2}):(\\d{2})$", "1900-01-01 $1:$2:00")
    if (s.startsWith("0")) return None
    if (!s.matches("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$") &&
        !s.matches("^\\d{4}-\\d{2}-\\d{2}$")) return None
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
