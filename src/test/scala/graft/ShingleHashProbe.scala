package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc probe (Test/runMain graft.ShingleHashProbe [sfDir]): q21's
  * pipeline decomposed, OLD formulation (explode shingle strings →
  * distinct → xxhash64) vs NEW (fused ShingleHashArray → distinct) at
  * each rung — locates where a regression lives when the end-to-end
  * numbers disagree. */
object ShingleHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val d = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.select((col("doc_id") + 10000000L).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))

    def oldHashed(): DataFrame = corpus
      .select(col("doc_id").as("id"),
        explode(graft.operators.Dedup.shingles(col("text"), 5)).as("sh"))
      .distinct()
      .select(col("id"), xxhash64(col("sh")).as("h"))
    def newHashed(): DataFrame = corpus
      .select(col("doc_id").as("id"),
        explode(graft.operators.Dedup.shingleHashArr(col("text"), 5,
          poly = false)).as("h"))
      .distinct()

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    def timeIt(name: String)(f: => Unit): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    // rung 0: the explode alone (no distinct)
    timeIt("explode-old")(noop(corpus.select(col("doc_id").as("id"),
      explode(graft.operators.Dedup.shingles(col("text"), 5)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))))
    timeIt("explode-new")(noop(corpus.select(col("doc_id").as("id"),
      explode(graft.operators.Dedup.shingleHashArr(col("text"), 5,
        poly = false)).as("h"))))
    // rung 1: + distinct
    timeIt("hashed-old")(noop(oldHashed()))
    timeIt("hashed-new")(noop(newHashed()))
    // rung 2: + 32-hash signature aggregate
    def sigs(hashed: DataFrame): DataFrame = {
      import org.apache.spark.sql.GraftColumnBridge
      val p = 2147483647L
      val coefs = graft.operators.Dedup.simhashCoefs(32, 42L)
      val x = pmod(col("h"), lit(p))
      val sigRow = transform(typedlit(coefs),
        c => pmod(x * c.getField("_1") + c.getField("_2"), lit(p)))
      val agg = GraftColumnBridge.column(
        graft.plans.ArrayMinAgg(GraftColumnBridge.expression(sigRow), 32)
          .toAggregateExpression())
      hashed.groupBy(col("id")).agg(agg.as("sig"))
    }
    timeIt("sigs-old")(noop(sigs(oldHashed())))
    timeIt("sigs-new")(noop(sigs(newHashed())))
    spark.stop()
  }
}
