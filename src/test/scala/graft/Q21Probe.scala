package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc q21 timing probe (Test/runMain graft.Q21Probe [sfDir]). */
object Q21Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    (1 to 4).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = graft.operators.PipelineQueries.q21MinhashLsh(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val load = scala.io.Source.fromFile("/proc/loadavg").getLines().next()
      println(f"q21 run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s  (loadavg $load)")
    }
    spark.stop()
  }
}
