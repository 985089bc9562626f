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

  test("exactPercentilesBinned equals exactPercentiles on adversarial shapes, any nBins") {
    import spark.implicits._
    // ties everywhere, an all-equal group, a single-row group, a
    // two-row group, and a near-continuous group — across two value
    // columns with different fractions
    val rows =
      (0 until 97).map(i => ("ties", (i % 7).toDouble, i * 1.5)) ++
      (0 until 40).map(_ => ("const", 42.0, 42.0)) ++
      Seq(("single", 3.25, -1.0)) ++
      Seq(("pair", 1.0, 10.0), ("pair", 2.0, 20.0)) ++
      (0 until 101).map(i => ("cont", math.sin(i) * 100, math.cos(i) * 50))
    val df = rows.toDF("k", "a", "b")
    val specs = Seq(("p10", "a", 0.10), ("p50", "a", 0.50),
      ("p99", "a", 0.99), ("bmed", "b", 0.5), ("b75", "b", 0.75))
    val want = OrderStats.exactPercentiles(df, Seq("k"), specs)
      .orderBy("k").collect().map(_.toSeq)
    // nBins = 1 degenerates to the full sort; 3 forces multi-row bins
    // with cross-bin ranks; 1024 is the default geometry
    for (nBins <- Seq(1, 3, 1024)) {
      val got = OrderStats.exactPercentilesBinned(df, Seq("k"), specs, nBins)
        .orderBy("k").collect().map(_.toSeq)
      assert(got.toSeq == want.toSeq, s"nBins=$nBins")
    }
    // partitioning-invariant: ties within a bin may rank different ROWS
    // across partitionings, but the VALUE at a rank is unique — the
    // output must not depend on physical layout
    val rep = OrderStats.exactPercentilesBinned(
        df.repartition(13), Seq("k"), specs, 3)
      .orderBy("k").collect().map(_.toSeq)
    assert(rep.toSeq == want.toSeq, "repartition changed binned percentiles")
    // the PRODUCTION entry routes to the binned variant and must give
    // the same values as the sort-path differential twin
    val routed = OrderStats.percentiles(df, Seq("k"), specs)
      .orderBy("k").collect().map(_.toSeq)
    assert(routed.toSeq == want.toSeq, "routed entry diverged")
  }
}
