package graft

import org.apache.spark.sql.SparkSession

/** Does the q163 noop write actually pay the simhash stage at sf10?
  * (count() provably does not — distinct-keyed left joins are
  * eliminated under it.) */
object CascadeNoopProbe {
  def main(args: Array[String]): Unit = {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val t0 = System.nanoTime()
    SparkEntry.queries("q163_dedup_cascade")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"cascade_noop","noop_sec":$sec%.2f}""")
    spark.stop()
  }
}
