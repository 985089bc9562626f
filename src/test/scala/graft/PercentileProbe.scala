package graft

import org.apache.spark.sql.SparkSession

/** sf-tier probe for the exact-percentile pair (`Test/runMain
  * graft.PercentileProbe [sfDir]`): times q34 (full per-group window
  * sort — [[graft.operators.OrderStats.exactPercentiles]], the measured
  * sort-bound wall of BENCH_sf10's watch item) against q219 (histogram
  * refinement — [[graft.operators.OrderStats.exactPercentilesBinned]],
  * which never sorts the full data) on the SAME lineitem tier, and
  * asserts the two land on identical values — the point of the variant
  * is a cheaper plan for the same order statistics, not an estimate.
  *
  * CROSSOVER (what makes binned the [[graft.operators.OrderStats
  * .percentiles]] production default): there is none in the measured
  * range — binned wins at sf0.1 (5.2 vs 8.6 s, round 11) AND sf10
  * (44.9 vs 208.3 s), and its 100×-data ratio is ~8.7× vs the sort's
  * ~58×, so the gap only widens upward. Below sf0.1 both are
  * sub-second and the choice is noise; the binned path's extra scan
  * never costs more than the sort it replaces on any tier measured.
  */
object PercentileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // time the collects directly (3-row results — driver cost nil), so
    // each side executes ONCE: q34 at the sf tier is the measured
    // sort-bound wall, and a second execution would double the probe
    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (a, sortSec) = t {
      graft.operators.ExtendedQueries.q34Percentiles(spark, sfDir)
        .collect().map(_.toSeq)
    }
    val (b, binnedSec) = t {
      graft.operators.ExtendedQueries.q219PercentilesBinned(spark, sfDir)
        .collect().map(_.toSeq)
    }
    val equal = a.toSeq == b.toSeq
    require(equal, s"binned != sort-based at $sfDir")
    println(f"""{"probe":"percentiles","sf_dir":"$sfDir",""" +
      f""""sort_sec":$sortSec%.2f,"binned_sec":$binnedSec%.2f,""" +
      f""""values_equal":$equal}""")
    spark.stop()
  }
}
