package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED-OPQ vs STRUCTURED-WH rotation at tier scale
  * (`Test/runMain graft.OpqProbe`): recall@5 against the exact float
  * ranking at equal bits (m=4, dsub=16, ksub=8 — 12 bits/vector) on
  * the three geometries the rotation question decomposes into, over
  * the ScaleGen sf10 embeddings (50k-vector slice, 64 coarse
  * clusters):
  *
  *  - REDUNDANT dims (q217's regime — every subquantizer slice carries
  *    a copy of the same 16 variables): WH's measured best case;
  *  - INDEPENDENT anisotropic dims (per-dim scaling 1 + j/4): the
  *    regime where r14 recorded WH level-or-worse and the verdict ask
  *    was whether a TRAINED rotation lifts it;
  *  - COMPOSED (planted clusters + cross-sub redundancy): the realistic
  *    production geometry.
  *
  * Each cell records recall@5 and the sidecar-write wall (the OPQ
  * train cost rides the write). The adopt-or-reject call lives at the
  * `opqIters` knob in Similarity.writePqSidecar.
  */
object OpqProbe {
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
    import graft.operators.Similarity

    val dir = "/tmp/graft_sf10"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "embeddings.parquet"))) {
      println(s"""{"probe":"opq","skipped":"no $dir"}""")
      spark.stop(); return
    }
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val nCap = 50000L
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < nCap)

    // the three geometries
    val redundant = graft.operators.SelectionQueries
      .redundantCorpus(spark, dir).filter(col("vec_id") < nCap)
    val independent = base.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") * (lit(1.0) + i.cast("double") / lit(4.0)))
        .as("embedding"))
    val centers = base.filter(col("vec_id") < 256)
      .select(col("vec_id").as("gid"), col("embedding").as("ce"))
    val composed = base
      .join(broadcast(centers), pmod(col("vec_id"), lit(256L)) === col("gid"))
      .select(col("vec_id"),
        zip_with(col("ce").cast("array<double>"),
          col("embedding").cast("array<double>"),
          (c, nz) => c + nz * lit(0.15)).as("e0"))
      .select(col("vec_id"),
        transform(col("e0"), (x, i) =>
          element_at(col("e0"), pmod(i, lit(16)) + 1) + x * lit(0.05))
          .as("embedding"))

    /** One geometry's row: exact top-5 once, then recall@5 + write
      * wall per flavor (plain / WH / OPQ-3). */
    def measure(tag: String, corpus0: DataFrame): String = {
      val corpus = corpus0.cache(); corpus.count()
      val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding",
        64, iters = 1)
      val store = java.nio.file.Files
        .createTempDirectory(s"graft-opq-$tag-").resolve("s").toString
      Similarity.writeStandingStore(
        corpus.withColumn("cluster",
            Similarity.assignCluster(col("embedding"), cents).cast("long"))
          .withColumn("nrm", Similarity.norm(col("embedding"))),
        store, "cluster", buckets = 64)
      Similarity.writeCodebook(spark, store, cents)
      val q = corpus.filter(col("vec_id") < 1000)
      val exTop = Similarity.bruteForceTopK(q, corpus, "vec_id",
          "embedding", k = 5)
        .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
        .localCheckpoint(true)
      val exCount = exTop.count()
      // 12-bit row (q217's bits) AND 64-bit row (the production-ish
      // config — at 50k candidates 12 bits is quantization-floor-bound
      // for every flavor, ≤7% recall, so the rotation question only
      // resolves at bits where ADC can discriminate)
      def cell(mm: Int, ds: Int, ks: Int, rotate: Boolean,
               opqIters: Int): (Double, Long) = {
        val w = t {
          Similarity.writePqSidecar(spark, store, "vec_id", "embedding",
            m = mm, dsub = ds, ksub = ks, rotate = rotate,
            opqIters = opqIters)
        }
        // nProbe 16/64 = the 25% probe ratio the small-store gates use
        val top = Similarity.pqTopKStore(spark, store, q, "vec_id",
            "embedding", m = mm, dsub = ds, k = 5, nProbe = 16)
          .select(col("query_id"), col("neighbor_id"))
        val r = if (exCount == 0) 0L
          else top.join(exTop, top("query_id") === col("q2") &&
            top("neighbor_id") === col("n2")).count() * 100 / exCount
        (w, r)
      }
      val (wp, rp) = cell(4, 16, 8, rotate = false, opqIters = 0)
      val (ww, rw) = cell(4, 16, 8, rotate = true, opqIters = 0)
      val (wo, ro) = cell(4, 16, 8, rotate = true, opqIters = 3)
      val (wp64, rp64) = cell(8, 8, 256, rotate = false, opqIters = 0)
      val (ww64, rw64) = cell(8, 8, 256, rotate = true, opqIters = 0)
      val (wo64, ro64) = cell(8, 8, 256, rotate = true, opqIters = 3)
      corpus.unpersist()
      f""""${tag}_recall_plain_pct":$rp,"${tag}_recall_wh_pct":$rw,""" +
        f""""${tag}_recall_opq_pct":$ro,"${tag}_write_plain_sec":$wp%.2f,""" +
        f""""${tag}_write_wh_sec":$ww%.2f,"${tag}_write_opq_sec":$wo%.2f,""" +
        f""""${tag}_recall64_plain_pct":$rp64,""" +
        f""""${tag}_recall64_wh_pct":$rw64,""" +
        f""""${tag}_recall64_opq_pct":$ro64,""" +
        f""""${tag}_write64_plain_sec":$wp64%.2f,""" +
        f""""${tag}_write64_wh_sec":$ww64%.2f,""" +
        f""""${tag}_write64_opq_sec":$wo64%.2f"""
    }

    val red = measure("redundant", redundant)
    val ind = measure("independent", independent)
    val comp = measure("composed", composed)
    println(s"""{"probe":"opq","n":$nCap,$red,$ind,$comp}""")
    spark.stop()
  }
}
