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

  test("histQuantiles: estimate within one bin width of exact, any partitioning") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val (lo, hi, nBins) = (0.0, 110000.0, 256)
    val binW = (hi - lo) / nBins
    val exact = OrderStats.exactPercentiles(li, Seq("l_returnflag"),
        Seq(("p50", "l_extendedprice", 0.5), ("p95", "l_extendedprice", 0.95)))
      .orderBy("l_returnflag").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val base = OrderStats.histQuantiles(li, Seq("l_returnflag"),
        "l_extendedprice", lo, hi, nBins, Seq(("p50", 0.5), ("p95", 0.95)))
      .orderBy("l_returnflag").collect()
    base.foreach { r =>
      val (e50, e95) = exact(r.getString(0))
      assert(math.abs(r.getDouble(1) - e50) <= binW, s"p50 ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - e95) <= binW, s"p95 ${r.getString(0)}")
    }
    // sketch counts are additive: the result is partitioning-invariant
    val rep = OrderStats.histQuantiles(li.repartition(13), Seq("l_returnflag"),
        "l_extendedprice", lo, hi, nBins, Seq(("p50", 0.5), ("p95", 0.95)))
      .orderBy("l_returnflag").collect()
    assert(base.toSeq == rep.toSeq)
  }

  test("histQuantiles clamps out-of-range values into edge bins") {
    import spark.implicits._
    val df = Seq(("g", -50.0), ("g", 5.0), ("g", 95.0), ("g", 1e9)).toDF("k", "v")
    val got = OrderStats.histQuantiles(df, Seq("k"), "v", 0.0, 100.0, 10,
      Seq(("p25", 0.25), ("p100", 1.0))).collect().head
    assert(got.getDouble(1) == 10.0)  // -50 clamps into bin 0 → edge 10
    assert(got.getDouble(2) == 100.0) // 1e9 clamps into bin 9 → edge 100
  }
}
