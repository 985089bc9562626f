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

  test("exec binds positional ? parameters (S8 doInDB contract)") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("k", "tag").createOrReplaceTempView("t_exec")
    val df = SqlScript.exec(spark,
      "SELECT count(*) AS n FROM t_exec WHERE tag = ? AND k > ?", Seq("a", 0))
    assert(df.head().getLong(0) == 2)
  }

  test("execMulti returns one result set per statement with named params") {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "tag").createOrReplaceTempView("t_multi")
    val rs = SqlScript.execMulti(spark,
      """SELECT count(*) AS n FROM t_multi WHERE tag = :tag;
        |SELECT max(k) AS mx FROM t_multi;""".stripMargin,
      Map("tag" -> "a"))
    assert(rs.length == 2)
    assert(rs(0).head().getLong(0) == 1)
    assert(rs(1).head().getInt(0) == 2)
  }

  test("statement splitter respects string literals") {
    assert(SqlScript.splitStatements(
      "SELECT 'a;b' AS x; SELECT \"it;s\" FROM t;  ; SELECT 1") ==
      Seq("SELECT 'a;b' AS x", "SELECT \"it;s\" FROM t", "SELECT 1"))
  }
}
