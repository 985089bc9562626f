package graft

import graft.pipeline.SqlScript
import graft.pipeline.SqlScript.CondExecs

/** Conditional post-load SQL batches (K7) with variable interpolation. */
class SqlScriptSpec extends SparkSpec {

  test("guarded batches run in order with interpolation") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("k", "tag").createOrReplaceTempView("t_script")
    val results = SqlScript.run(spark, Seq(
      CondExecs(() => true, Seq(
        "SELECT count(*) AS n FROM t_script WHERE tag = '${tag}'",
        "SELECT max(k) AS mx FROM t_script")),
      CondExecs(() => false, Seq("SELECT 1/0"))), // guarded off, never runs
      vars = Map("tag" -> "a"))
    assert(results.length == 2)
    assert(results(0).head().getLong(0) == 2)
    assert(results(1).head().getInt(0) == 3)
  }

  test("undefined variable is a configuration error") {
    intercept[IllegalArgumentException] {
      SqlScript.interpolate("SELECT '${nope}'", Map.empty)
    }
  }
}
