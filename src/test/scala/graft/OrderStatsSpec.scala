package graft

import graft.operators.OrderStats
import org.apache.spark.sql.functions._

/** Rank-based exact percentiles must agree bit-for-bit with Spark's own
  * `percentile` aggregate (the all-values-buffer implementation it
  * replaces for scale). */
class OrderStatsSpec extends SparkSpec {

  test("matches the percentile aggregate on lineitem") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val got = OrderStats.exactPercentiles(li, Seq("l_returnflag"),
        Seq(("p25", "l_quantity", 0.25), ("p50", "l_quantity", 0.5),
            ("p75", "l_quantity", 0.75), ("pm", "l_extendedprice", 0.5)))
      .orderBy("l_returnflag").collect()
    li.createOrReplaceTempView("li_os")
    val want = spark.sql(
      """SELECT l_returnflag, percentile(l_quantity, 0.25) AS p25,
        |  percentile(l_quantity, 0.5) AS p50,
        |  percentile(l_quantity, 0.75) AS p75,
        |  percentile(l_extendedprice, 0.5) AS pm
        |FROM li_os GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a, b) => assert(a == b) }
  }

  test("integral positions and single-row groups") {
    import spark.implicits._
    // group "a": 5 values → p50 lands exactly on rank 2 (0-based); group
    // "b": one row → every percentile is that row's value
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 7.0), ("a", 9.0), ("a", 20.0),
                 ("b", 4.5)).toDF("k", "v")
    val got = OrderStats.exactPercentiles(df, Seq("k"),
        Seq(("p50", "v", 0.5), ("p25", "v", 0.25)))
      .orderBy("k").collect()
    assert(got(0).getDouble(1) == 7.0 && got(0).getDouble(2) == 3.0)
    assert(got(1).getDouble(1) == 4.5 && got(1).getDouble(2) == 4.5)
  }
}
