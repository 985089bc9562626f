package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Seeding-cost probe (`Test/runMain graft.SeedScaleProbe [sfDir]`):
  * [[graft.operators.Similarity.seedFarthestFirst]] maintains the
  * nearest-seed distance as a materialized running-min column, so
  * seeding k centroids is k top-1 scans with O(k) total distance folds
  * per row. The pre-round-9 formulation re-`least`ed the whole seed
  * list each round — k scans but O(k²) folds per row, which is the
  * same flat-scan wall the √k assignment ladder removed elsewhere.
  *
  * The probe times the production path at k = 16/32/64 and prints the
  * per-seed cost: linear-in-k seeding keeps sec/k roughly flat as k
  * doubles; the quadratic shape doubles it. It also replays the OLD
  * shape (re-reduced seed list, no materialization) at the same ks as
  * the comparison baseline.
  */
object SeedScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // corpus replication factor: at the gate corpora (2k vectors) the
    // per-round job overhead hides the fold cost; replicating to ~100k+
    // vectors puts the distance folds back in charge, which is the
    // regime the rewrite targets
    val rep = if (args.length > 1) args(1).toInt else 1
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

    val emb0 = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val emb = (if (rep <= 1) emb0
      else emb0
        .select(col("vec_id"), col("embedding"),
          explode(typedlit(Seq.range(0, rep))).as("r"))
        // perturb one component per replica so replicas aren't exact
        // duplicates (degenerate farthest-first ties), keep ids unique
        .select((col("vec_id") + col("r") * 10000000L).as("vec_id"),
          transform(col("embedding"),
            (v, i) => v + when(i === 0, col("r") * lit(1e-4f))
              .otherwise(lit(0f))).as("embedding"))).cache()
    val n = emb.count()

    /** The pre-round-9 quadratic shape, kept here as the baseline. */
    def seedQuadratic(k: Int): Seq[Seq[Double]] = {
      def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
        r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toSeq
      val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      var cents = Seq(vecOf(base.orderBy(col("id")).limit(1).collect().head))
      while (cents.length < k) {
        val dNearest = cents.map(c => Similarity.squaredDist(col("v"), typedlit(c)))
          .reduce((a, b) => least(a, b))
        val next = base.withColumn("d", dNearest)
          .orderBy(col("d").desc, col("id")).limit(1).collect().head
        cents :+= vecOf(next)
      }
      cents
    }

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val ks = Seq(16, 32, 64)
    val entries = ks.map { k =>
      val (seeds, tLin) = time(
        Similarity.seedFarthestFirst(emb, "vec_id", "embedding", k))
      val (old, tQuad) = time(seedQuadratic(k))
      require(seeds == old, s"materialized path diverged at k=$k")
      f""""k$k":{"linear_sec":$tLin%.2f,"quadratic_sec":$tQuad%.2f,""" +
        f""""linear_sec_per_seed":${tLin / k}%.4f}"""
    }
    println(s"""{"probe":"seed_farthest_first","sf_dir":"$sfDir","n":$n,""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}
