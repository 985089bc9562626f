package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The LAYOUT lever for the judge's past-PushdownCap growth term
  * (`Test/runMain graft.BandLayoutProbe`): the band index rebuilt at a
  * FINER bsig directory granularity (`graft.lsh.bandIndexBuckets` =
  * 4096 vs the default 64), judged with 500- and 5000-doc deltas
  * against 50k and 500k standing corpora. The hypothesis under test:
  * past the literal-pushdown cap (~1000 bsig values) the judge's index
  * scan is unpruned at 64 dirs (a 4000-bsig delta touches every dir),
  * while at 4096 dirs the touched-dir list itself prunes ~40% of the
  * scan at 500-doc deltas — IF the listing and small-file overhead of
  * 64× more directories doesn't eat the saving. Chunking lost twice
  * (round 13); this is the remaining untried lever, measured so the
  * default is a recorded tradeoff either way.
  */
object BandLayoutProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val dir = "/tmp/graft_sf10"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "documents.parquet"))) {
      println(s"""{"probe":"band_layout","skipped":"no $dir"}""")
      spark.stop(); return
    }
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val small = docs.filter(col("doc_id") % 10 === 3).cache()
    val nSmall = small.count()
    // 500-doc and 5000-doc near-dup deltas (the r13 worst point and
    // the amortized tier)
    val d500 = docs.filter(col("doc_id") % 1000 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")).cache()
    val n500 = d500.count()
    val d5000 = docs.filter(col("doc_id") % 100 === 3)
      .select((col("doc_id") + 30000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")).cache()
    val n5000 = d5000.count()

    /** One (standing, layout) cell: sig store + sidecar built once per
      * corpus by the caller; this rebuilds the index at `idxBuckets`
      * and judges both deltas (warm: first judge of each delta is
      * discarded as in r13's quiet-probe methodology — min of 2). */
    def judgeBoth(store: String, corpus: DataFrame): (Double, Double) = {
      def j(d: DataFrame): Double = {
        val a = t { Dedup.lshJudgeStore(spark, store, corpus, d,
          "doc_id", "text").count() }
        val b = t { Dedup.lshJudgeStore(spark, store, corpus, d,
          "doc_id", "text").count() }
        math.min(a, b)
      }
      (j(d500), j(d5000))
    }
    def buildStore(corpus: DataFrame): String = {
      val store = java.nio.file.Files
        .createTempDirectory("graft-blp-").resolve("sigs").toString
      Dedup.writeSignatureStore(
        Dedup.minhashSignatures(corpus, "doc_id", "text"),
        store, "doc_id", buckets = 64)
      Dedup.writeShingleSidecar(spark, store, corpus, "doc_id", "text")
      store
    }
    def withIdxBuckets[T](b: Int)(body: => T): T = {
      spark.conf.set("graft.lsh.bandIndexBuckets", b.toString)
      try body finally spark.conf.unset("graft.lsh.bandIndexBuckets")
    }

    val storeS = buildStore(small)
    val storeF = buildStore(docs)
    // default layout (64 dirs = store buckets)
    val idx64SmallSec = t { Dedup.writeBandIndex(spark, storeS, "doc_id",
      bands = 8) }
    val (j500s64, j5000s64) = judgeBoth(storeS, small)
    val idx64FullSec = t { Dedup.writeBandIndex(spark, storeF, "doc_id",
      bands = 8) }
    val (j500f64, j5000f64) = judgeBoth(storeF, docs)
    // fine layout (4096 bsig dirs)
    val idx4kSmallSec = withIdxBuckets(4096) {
      t { Dedup.writeBandIndex(spark, storeS, "doc_id", bands = 8) } }
    val (j500s4k, j5000s4k) = judgeBoth(storeS, small)
    val idx4kFullSec = withIdxBuckets(4096) {
      t { Dedup.writeBandIndex(spark, storeF, "doc_id", bands = 8) } }
    val (j500f4k, j5000f4k) = judgeBoth(storeF, docs)

    println(f"""{"probe":"band_layout","n_docs":$n,"n_small":$nSmall,""" +
      f""""n_d500":$n500,"n_d5000":$n5000,""" +
      f""""idx_build_64_small_sec":$idx64SmallSec%.2f,""" +
      f""""idx_build_64_full_sec":$idx64FullSec%.2f,""" +
      f""""idx_build_4k_small_sec":$idx4kSmallSec%.2f,""" +
      f""""idx_build_4k_full_sec":$idx4kFullSec%.2f,""" +
      f""""judge500_64_small_sec":$j500s64%.2f,""" +
      f""""judge500_64_full_sec":$j500f64%.2f,""" +
      f""""judge5000_64_small_sec":$j5000s64%.2f,""" +
      f""""judge5000_64_full_sec":$j5000f64%.2f,""" +
      f""""judge500_4k_small_sec":$j500s4k%.2f,""" +
      f""""judge500_4k_full_sec":$j500f4k%.2f,""" +
      f""""judge5000_4k_small_sec":$j5000s4k%.2f,""" +
      f""""judge5000_4k_full_sec":$j5000f4k%.2f,""" +
      // the AUTO rule's choice at each measured tier — must name the
      // tier's measured-best layout (the store bucket count below the
      // ~125k docs/dir crossover; see Dedup.autoBandIndexBuckets)
      f""""auto_small":${Dedup.autoBandIndexBuckets(64, nSmall)},""" +
      f""""auto_full":${Dedup.autoBandIndexBuckets(64, n)}}""")
    spark.stop()
  }
}
