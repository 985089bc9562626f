package graft

import org.scalatest.funsuite.AnyFunSuite

/** The canonical-record KEEP-THE-FASTER rule
  * ([[Bench.slowerThanStanding]]): a slower-calib-scaled run over the
  * shared gates must be refused, a faster-or-equal one allowed, and
  * incomparable records (different sf, no calib, disjoint gates) must
  * not block. This is the rule that stops a load phantom on untouched
  * code from silently evicting a faster steering record. */
class BenchRuleSpec extends AnyFunSuite {

  private def record(sf: String, calib: Double,
                     qs: Map[String, Double]): String = {
    val queries = qs.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":1.0,"queries":$queries,""" +
      s""""sf":"$sf","calib_sec":$calib,"quiet":true}"""
  }

  private val standing = record("/data/sf0.1", 1.0,
    Map("q1" -> 2.0, "q2" -> 3.0))

  test("a slower scaled run (beyond the 5% slack) is refused with the comparison") {
    val r = Bench.slowerThanStanding(Map("q1" -> 2.5, "q2" -> 3.5),
      newCalib = 1.0, Some(standing), "/data/sf0.1")
    assert(r.isDefined && r.get.contains("keeping the faster record"),
      r.toString)
  }

  test("equal (within slack) and faster runs replace") {
    assert(Bench.slowerThanStanding(Map("q1" -> 2.05, "q2" -> 3.05),
      1.0, Some(standing), "/data/sf0.1").isEmpty)
    assert(Bench.slowerThanStanding(Map("q1" -> 1.0, "q2" -> 2.0),
      1.0, Some(standing), "/data/sf0.1").isEmpty)
  }

  test("calibration cancels box speed: same scaled cost on a 2x-slower box replaces") {
    assert(Bench.slowerThanStanding(Map("q1" -> 4.0, "q2" -> 6.0),
      newCalib = 2.0, Some(standing), "/data/sf0.1").isEmpty)
    // and a genuinely slower run can't hide behind a fast box
    assert(Bench.slowerThanStanding(Map("q1" -> 1.5, "q2" -> 2.25),
      newCalib = 0.5, Some(standing), "/data/sf0.1").isDefined)
  }

  test("only SHARED gates compare: a run that adds gates re-anchors on the common set") {
    assert(Bench.slowerThanStanding(
      Map("q1" -> 2.0, "q2" -> 3.0, "q3_new" -> 100.0),
      1.0, Some(standing), "/data/sf0.1").isEmpty)
  }

  test("incomparable records never block: different sf, no record, bad calib, disjoint gates") {
    assert(Bench.slowerThanStanding(Map("q1" -> 99.0), 1.0,
      Some(standing), "/data/sf0.01").isEmpty)
    assert(Bench.slowerThanStanding(Map("q1" -> 99.0), 1.0,
      None, "/data/sf0.1").isEmpty)
    assert(Bench.slowerThanStanding(Map("q1" -> 99.0), -1.0,
      Some(standing), "/data/sf0.1").isEmpty)
    assert(Bench.slowerThanStanding(Map("qX" -> 99.0), 1.0,
      Some(standing), "/data/sf0.1").isEmpty)
    // a record with calib_sec <= 0 is not a reference
    val noCalib = record("/data/sf0.1", -1.0, Map("q1" -> 2.0))
    assert(Bench.slowerThanStanding(Map("q1" -> 99.0), 1.0,
      Some(noCalib), "/data/sf0.1").isEmpty)
  }

  test("failed gates (negative secs) are excluded from the comparison") {
    assert(Bench.slowerThanStanding(Map("q1" -> -1.0, "q2" -> 3.0),
      1.0, Some(standing), "/data/sf0.1").isEmpty)
  }

  test("calibration artifact (calib moved, raw level) compares on raw — both directions") {
    // r15's live case: a quiet run's calib read 1.4x the standing
    // record's while its raw total was level — its scaled total looked
    // 30% "faster" purely from the bad divisor. Raw-level + calib-moved
    // is the artifact signature; the decision must fall back to raw.
    // Direction 1: the artifact run tries to evict an honest record —
    // raw is level, so it replaces (harmless; its own calib is stamped
    // into the file but the NEXT comparison self-heals, direction 2)
    assert(Bench.slowerThanStanding(Map("q1" -> 2.01, "q2" -> 3.02),
      newCalib = 1.4, Some(standing), "/data/sf0.1").isEmpty)
    // Direction 2: an HONEST run vs a standing artifact record (its
    // stamped calib 1.4x too high): scaled would read the honest run
    // 40% "slower" and refuse it forever; raw is level so it replaces
    val artifact = record("/data/sf0.1", 1.4,
      Map("q1" -> 2.0, "q2" -> 3.0))
    assert(Bench.slowerThanStanding(Map("q1" -> 2.02, "q2" -> 3.01),
      newCalib = 1.0, Some(artifact), "/data/sf0.1").isEmpty)
    // and a run whose raw total genuinely regressed >5% under the
    // artifact signature's calib mismatch is still refused on raw
    assert(Bench.slowerThanStanding(Map("q1" -> 2.2, "q2" -> 3.2),
      newCalib = 1.4, Some(standing), "/data/sf0.1").isDefined)
    // a 2x-slower box moves raw AND calib together — NOT the artifact
    // signature; the scaled comparison still governs (cancels the box)
    assert(Bench.slowerThanStanding(Map("q1" -> 4.0, "q2" -> 6.0),
      newCalib = 2.0, Some(standing), "/data/sf0.1").isEmpty)
  }
}
