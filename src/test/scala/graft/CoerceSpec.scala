package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Coerce._

/** Goldens from the reference's `t/File.t:8-9` (normalizeNumerics) plus the
  * `Wrap/DB.pm:238-312` coercion battery behaviors, and property tests for
  * locale-number round-trips. */
class CoerceSpec extends AnyFunSuite {

  test("normalizeNumerics goldens (t/File.t:8-9)") {
    assert(normalizeNumerics("22.123.123,013", ".", ",") == "22123123.013")
    assert(normalizeNumerics("123,01E-107", ",", ",") == "123.01E-107")
  }

  test("normalizeNumerics defaults and pass-through") {
    assert(normalizeNumerics("22,123,123.013") == "22123123.013")
    assert(normalizeNumerics("1,234") == "1234")
    assert(normalizeNumerics("abc,def") == "abc,def")
    assert(normalizeNumerics("12,34") == "12,34") // not a grouped numeral
    assert(normalizeNumerics("12,34", ".", ",") == "12.34")
    assert(normalizeNumerics("-1.234.567,89", ".", ",") == "-1234567.89")
  }

  test("normalizeNumerics round-trip property (locale German, seeded random)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = rnd.nextLong() % 1000000000L
      val f = rnd.nextInt(1000)
      val v = BigDecimal(n).abs + BigDecimal(f) / 1000
      val german = {
        val s = v.toBigInt.toString.reverse.grouped(3).mkString(".").reverse
        s + "," + f"${f}%03d"
      }
      val norm = normalizeNumerics(german, ".", ",")
      assert(BigDecimal(norm) == v, s"german=$german norm=$norm")
    }
  }

  test("coerceNumeric battery (Wrap/DB.pm:244-256)") {
    assert(coerceNumeric("17.000").contains(17.0))   // trailing-zero strip
    assert(coerceNumeric("123.45-").contains(-123.45)) // SAP postfix minus
    assert(coerceNumeric("12%").contains(12.0))      // percent strip
    assert(coerceNumeric("17E2").contains(1700.0))   // scientific
    assert(coerceNumeric("123.01E-107").contains(123.01e-107))
    assert(coerceNumeric("N/A").isEmpty)
    assert(coerceNumeric("abc").isEmpty)
    assert(coerceNumeric("").isEmpty)
    assert(coerceNumeric("1E-309").contains(0.0))    // subnormal flush
    assert(coerceNumeric("-5").contains(-5.0))
    assert(coerceNumeric(".5").contains(0.5))
  }

  test("coerceBool (Wrap/DB.pm:258-262)") {
    assert(coerceBool("WAHR").contains(true))
    assert(coerceBool("wahr").contains(true))
    assert(coerceBool("TRUE").contains(true))
    assert(coerceBool("FALSCH").contains(false))
    assert(coerceBool("false").contains(false))
    assert(coerceBool("1").contains(true))
    assert(coerceBool("0").contains(false))
    assert(coerceBool("x").isEmpty)
  }

  test("coerceDateTime cascade (Wrap/DB.pm:264-301)") {
    assert(coerceDateTime("02.01.1995").contains("1995-01-02 00:00:00"))
    assert(coerceDateTime("02/01/1995").contains("1995-01-02 00:00:00"))
    assert(coerceDateTime("02.01.1995 12:34:56").contains("1995-01-02 12:34:56"))
    assert(coerceDateTime("19950102").contains("1995-01-02 00:00:00"))
    assert(coerceDateTime("19950102123456").contains("1995-01-02 12:34:56"))
    assert(coerceDateTime("19950102235960").contains("1995-01-02 23:59:59")) // SAP :60
    assert(coerceDateTime("1995.01.02").contains("1995-01-02 00:00:00"))
    assert(coerceDateTime("1995-01-02 12:34:56").contains("1995-01-02 12:34:56"))
    assert(coerceDateTime("02.01.95").contains("1995-01-02 00:00:00"))  // 95 > 60 → 19
    assert(coerceDateTime("02.01.01").contains("2001-01-02 00:00:00"))  // 01 ≤ 60 → 20
    assert(coerceDateTime("12:34:56").contains("1900-01-01 12:34:56"))
    assert(coerceDateTime("123456").contains("1900-01-01 12:34:56"))
    // "12:34" fails the reference's shape gate (Wrap/DB.pm:266) before its
    // HH:MM rule can fire — that rule is unreachable; undef/None is parity
    assert(coerceDateTime("12:34").isEmpty)
    assert(coerceDateTime("00:00:00").isEmpty)
    assert(coerceDateTime("00000000").isEmpty)  // zero date → leading-0 reject
    assert(coerceDateTime("N/A").isEmpty)
    assert(coerceDateTime("garbage").isEmpty)
    // reference's msec rule is an unreachable no-op → msec inputs fail the
    // final shape check, matching Perl's undef
    assert(coerceDateTime("1995-01-02 12:34:56.123").isEmpty)
  }

  test("coerceString length gate (Wrap/DB.pm:304-310)") {
    assert(coerceString("hello", 10).contains("hello"))
    assert(coerceString("hello", 3).isEmpty)
    assert(coerceString("a\nb", 10).contains("ab"))
  }
}
