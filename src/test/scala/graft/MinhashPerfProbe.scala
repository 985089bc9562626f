package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc probe: ArrayMinAgg signature build vs 32 separate min columns
  * on the sf0.1 dup corpus (Test/runMain graft.MinhashPerfProbe). */
object MinhashPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))

    val p = 2147483647L
    val coefs = graft.operators.Dedup.simhashCoefs(32, 42L).map(c => (c._1, c._2))
    // minhash coefficient seeding differs; irrelevant for timing
    val hashed = corpus
      .select(col("doc_id").as("id"),
        explode(graft.operators.Dedup.shingles(col("text"), 5)).as("sh"))
      .distinct()
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val x = pmod(col("h"), lit(p))

    def timeIt(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n groups)")
      }
    }

    timeIt("cols32") {
      val minhashes = coefs.zipWithIndex.map { case ((a, b), i) =>
        min(pmod(x * lit(a) + lit(b), lit(p))).as(s"mh_$i")
      }
      hashed.groupBy(col("id")).agg(minhashes.head, minhashes.tail: _*).count()
    }
    timeIt("arrayAgg") {
      import org.apache.spark.sql.GraftColumnBridge
      val sigRow = transform(typedlit(coefs),
        c => pmod(x * c.getField("_1") + c.getField("_2"), lit(p)))
      val agg = GraftColumnBridge.column(
        graft.plans.ArrayMinAgg(GraftColumnBridge.expression(sigRow), 32)
          .toAggregateExpression())
      hashed.groupBy(col("id")).agg(agg.as("sig")).count()
    }
    spark.stop()
  }
}
