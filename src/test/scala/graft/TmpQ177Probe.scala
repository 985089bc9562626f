package graft

import org.apache.spark.sql.SparkSession

object TmpQ177Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val n = graft.operators.SelectionQueries
        .q177IncrementalDedup(spark, "/root/testdata/sf0.01").collect().length
      println(s"GATE OK rows=$n")
    } catch { case e: Throwable =>
      var t: Throwable = e
      while (t != null) {
        println("CAUSE: " + t.getClass.getName + ": " +
          Option(t.getMessage).getOrElse("").linesIterator.take(1).mkString)
        t = t.getCause
      }
    }
    spark.stop()
  }
}
