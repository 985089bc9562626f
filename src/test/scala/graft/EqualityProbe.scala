package graft

import org.apache.spark.sql.SparkSession
import graft.operators.PipelineQueries

/** Ad-hoc probe (Test/runMain graft.EqualityProbe): is the MinHash-LSH
  * verified pair set (q21) identical to the exact n-gram Jaccard pair set
  * (q20) on the test corpora? If yes, q20's oracle doubles as q21's.
  */
object EqualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val q20 = PipelineQueries.q20DedupNgram(spark, dir)
      val q21 = PipelineQueries.q21MinhashLsh(spark, dir)
      val only20 = q20.exceptAll(q21).count()
      val only21 = q21.exceptAll(q20).count()
      println(s"$sf: q20=${q20.count()} q21=${q21.count()} q20\\q21=$only20 q21\\q20=$only21")
    }
    spark.stop()
  }
}
