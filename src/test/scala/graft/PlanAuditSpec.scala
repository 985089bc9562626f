package graft

/** Runs the full physical-plan audit ([[PlanAudit.run]]) inside `sbt
  * test`, so a plan regression — a dimension join degrading to
  * shuffled-hash, a filter no longer reaching the scan, a new cartesian
  * — fails CI instead of waiting for a manual `Test/runMain`. The audit
  * only PLANS queries (plus one small partitioned write), so the suite
  * costs seconds, not a bench run.
  *
  * The audit reads static plan strings, which AQE's wrapper obscures;
  * an isolated child session (shared SparkContext, own SQL conf) turns
  * AQE off for the audit without touching the other suites' session.
  */
class PlanAuditSpec extends SparkSpec {
  test("physical-plan audit: zero failures") {
    assume(new java.io.File("/root/testdata/sf0.01").isDirectory,
      "audit fixture dir missing")
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val failures = PlanAudit.run(s, "/root/testdata/sf0.01")
    assert(failures == 0, s"$failures plan-audit check(s) failed — see FAIL lines above")
  }
}
