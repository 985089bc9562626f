package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THIRD LEVER on the judge's past-PushdownCap growth term
  * (`Test/runMain graft.RuntimeFilterProbe`): Spark's runtime
  * bloom-filter injection (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`). The band-index judgment's standing-side scan goes
  * unpruned once the delta's bsig literal list exceeds the parquet
  * pushdown cap (r13's chunking lever and r14's layout lever were
  * both measured and rejected); a runtime bloom built from the
  * delta's band rows could row-filter the slice before the join
  * probes it. Measured: lshJudgeStore wall at 500k standing, 500- and
  * 5000-doc deltas, conf OFF vs ON, min-of-2 each, plus the session
  * default so the record shows whether the canonical chain already
  * runs with it. */
object RuntimeFilterProbe {
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
      println(s"""{"probe":"runtime_filter","skipped":"no $dir"}""")
      spark.stop(); return
    }
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val conf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val default = spark.conf.get(conf)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()
    val store = java.nio.file.Files
      .createTempDirectory("graft-rfp-").resolve("sigs").toString
    Dedup.writeSignatureStore(
      Dedup.minhashSignatures(docs, "doc_id", "text"),
      store, "doc_id", buckets = 64)
    Dedup.writeBandIndex(spark, store, "doc_id", bands = 8)
    Dedup.writeShingleSidecar(spark, store, docs, "doc_id", "text")
    def delta(mod: Int) = docs.filter(col("doc_id") % mod === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
      .cache()
    val d500 = delta(1000); d500.count()
    val d5000 = delta(100); d5000.count()
    def judge(d: org.apache.spark.sql.DataFrame): Double = {
      // min-of-2: the first run pays listing/JIT warmup
      val a = t { Dedup.lshJudgeStore(spark, store, docs, d,
        "doc_id", "text").count() }
      val b = t { Dedup.lshJudgeStore(spark, store, docs, d,
        "doc_id", "text").count() }
      math.min(a, b)
    }
    def withConf(v: String)(body: => (Double, Double)): (Double, Double) = {
      spark.conf.set(conf, v)
      try body finally spark.conf.set(conf, default)
    }
    val (off500, off5000) = withConf("false") { (judge(d500), judge(d5000)) }
    val (on500, on5000) = withConf("true") { (judge(d500), judge(d5000)) }
    println(f"""{"probe":"runtime_filter","n":$n,""" +
      f""""bloom_conf_default":"$default",""" +
      f""""judge500_off_sec":$off500%.2f,"judge500_on_sec":$on500%.2f,""" +
      f""""judge5000_off_sec":$off5000%.2f,""" +
      f""""judge5000_on_sec":$on5000%.2f}""")
    spark.stop()
  }
}
