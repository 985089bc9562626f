package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Bloom, Dedup, Sampling}

/** Decompose q66_bloom_decontam's prepare bill (r15 canonical: 27.45 s
  * prepare vs 1.31 s exec at sf0.1 — the build side is 10% of the corpus
  * yet costs ~20× the probe side). Times each stage of
  * [[Bloom.buildBitmap]] through the noop sink to find the wall.
  *
  * Run: Test/runMain graft.BloomBuildProbe [sfDir]
  */
object BloomBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(body: => Unit): Double = {
      body // warm-up
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bloomprobe] $label%-40s $s%8.3f s")
      s
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // q66's exact corpus/split
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val dup = d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
    val docs = Sampling.withSplit(dup, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1), seed = 13L)
    val bench = docs.filter(col("split") === "test")
      .select(explode(Dedup.shingles(col("text"), 8)).as("sh"))
      .filter(length(col("sh")) > 0)
    val numBits = 1 << 20; val numHashes = 3; val seed = 29L
    val nWords = numBits / 64

    timed("A bench shingles only")(noop(bench))
    val pos = Bloom.positions(Dedup.polyHash(col("sh")), numBits, numHashes, seed)
    val exploded = bench.select(explode(array(pos: _*)).as("pos"))
    timed("B + positions explode")(noop(exploded))
    val words = exploded
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("word"))
    timed("C + groupBy(w) bit_or")(noop(words))
    timed("D full buildBitmap collect") {
      Bloom.buildBitmap(bench, "sh", numBits, numHashes, seed)
        .collect()(0).getSeq[Long](0)
    }
    timed("E words.collect driver assemble") {
      val arr = new Array[Long](nWords)
      words.collect().foreach(r => arr(r.getInt(0)) = r.getLong(1))
    }
    spark.stop()
  }
}
