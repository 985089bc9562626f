package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf10 probe for the semantic-dedup scale path (`Test/runMain
  * graft.Sf10Probe [sfDir] [k]`): q85's GATE uses the 10 label-centroids
  * (fixed k — value-checkable against the DuckDB oracle), which makes the
  * within-cluster pair space Σ|cluster|² grow QUADRATICALLY as the corpus
  * scales past the codebook. The production configuration scales k with n
  * so |cluster| stays bounded; this probe times exactly that: a k-means
  * codebook (deterministic [[graft.operators.Similarity.trainCentroids]])
  * at k ∝ n, then [[graft.operators.Similarity.semDedup]] over the same
  * corpus shape as q85. BENCH_sf10.json records both sides: the fixed-k
  * gate saturating (by design) and the scaled-k path staying tractable.
  */
object Sf10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val k = if (args.length > 1) args(1).toInt else 256
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

    // q85's corpus shape: embeddings + 20% scaled twins
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val twins = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"),
        col("label"))
    val corpus = emb.unionByName(twins)
      .select(col("vec_id"),
        when(col("vec_id") >= 100000000L,
          transform(col("embedding"), v => v * lit(1.5f)))
          .otherwise(col("embedding")).as("embedding"))
      .cache()
    val n = corpus.count()

    val t0 = System.nanoTime()
    val cents = graft.operators.Similarity.trainCentroids(
      corpus, "vec_id", "embedding", k, iters = 2)
    val tTrain = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    graft.operators.Similarity
      .semDedup(corpus, "vec_id", "embedding", cents, minCos = 0.99)
      .write.format("noop").mode("overwrite").save()
    val tDedup = (System.nanoTime() - t1) / 1e9

    println(f"""{"probe":"semdedup_scaled_k","sf_dir":"$sfDir","n":$n,"k":$k,""" +
      f""""train_sec":$tTrain%.2f,"dedup_sec":$tDedup%.2f}""")

    // round 8: the √k assignment ladder (q173's operator) on the SAME
    // trained codebook — n·2√k distance folds instead of n·k for the
    // dedup's assignment pass; the delta vs dedup_sec above is the
    // ladder's saving at 100× data
    val t1b = System.nanoTime()
    graft.operators.Similarity
      .semDedupTwoLevel(corpus, "vec_id", "embedding", cents, minCos = 0.99)
      .write.format("noop").mode("overwrite").save()
    val tDedup2 = (System.nanoTime() - t1b) / 1e9
    println(f"""{"probe":"semdedup_two_level","sf_dir":"$sfDir","n":$n,"k":$k,""" +
      f""""dedup_sec":$tDedup2%.2f}""")

    // q133's scale path shares the codebook: the GATE blocks the kNN
    // graph on the 10 fixed labels (oracle-checkable, quadratic past the
    // codebook like q85's fixed-k gate); production re-clusters at
    // k ∝ n so Σ|cluster|² stays linear. Reuse the trained codebook —
    // at 100 TB it would be the same standing quantizer.
    val knnInput = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cluster",
        graft.operators.Similarity.assignCluster(col("embedding"), cents))
    val t2 = System.nanoTime()
    graft.operators.Similarity
      .knnGraph(knnInput, "vec_id", "embedding", "cluster", k = 3)
      .write.format("noop").mode("overwrite").save()
    val tKnn = (System.nanoTime() - t2) / 1e9
    println(f"""{"probe":"knn_graph_scaled_k","sf_dir":"$sfDir","k":$k,""" +
      f""""knn_sec":$tKnn%.2f}""")
    spark.stop()
  }
}
