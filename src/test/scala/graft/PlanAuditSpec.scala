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
    // README quotes the property count; keep it honest (r14 found it
    // two rounds stale)
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = java.util.regex.Pattern
      .compile("asserts (\\d+) plan properties").matcher(readme)
    assert(m.find(), "README no longer states the plan-property count")
    assert(m.group(1).toInt == PlanAudit.checksRun,
      s"README claims ${m.group(1)} plan properties; the audit ran" +
        s" ${PlanAudit.checksRun} — update README.md")
  }
}
