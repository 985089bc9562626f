package graft

import org.apache.spark.sql.SparkSession

/** Round-8 verdict item: do the multi-join composites (q154, q157, q163)
  * re-scan `documents` once per join branch, or reuse one scan?
  * (`Test/runMain graft.ScanReuseProbe [sfDir]`.) Counts FileScan
  * references to each base table in the executed plan — with AQE off the
  * static plan shows every scan node. A composite that derives four
  * signals from one corpus SHOULD show multiple scans only when the
  * branches prune DIFFERENT columns (cheaper than materializing the
  * union of columns for all branches); the probe prints the per-scan
  * ReadSchema widths so that judgment call is visible. */
object ScanReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q154_stopword_density", "q157_signal_fusion",
        "q163_dedup_cascade")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
    for (t <- Seq("documents", "embeddings", "events", "lineitem")) {
        val n = s"$t\\.parquet".r.findAllIn(plan).length
        if (n > 0) println(s"$q: $t scan refs = $n")
      }
      // ReadSchema lines show how wide each scan is
      plan.linesIterator.filter(_.contains("ReadSchema"))
        .foreach(l => println(s"  ${l.trim.take(160)}"))
    }
    spark.stop()
  }
}
