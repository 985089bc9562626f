package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-dedup cost curve (`Test/runMain graft.IncrementalProbe`):
  * the q177/q181 claim under measurement — a standing corpus absorbs a
  * CONSTANT-SIZE delta batch at a per-batch cost that does not follow
  * the base's growth, because the base is never self-joined and (q181)
  * its assignment is stored, not recomputed.
  *
  * Three tiers: sf0.1 (2k vectors), ScaleGen sf1 (20k), ScaleGen sf10
  * (200k), each with k = ceil(n/50) (the production k ∝ n discipline —
  * constant expected cluster size, so the delta's per-row join work is
  * flat by construction). The same ~830-row delta batch is scored
  * against every tier. Per tier, two timed paths:
  *   - `delta_store_sec`: [[graft.operators.Similarity.semDedupIncrementalAssigned]]
  *     against the parquet standing store (built once, untimed) — the
  *     production shape;
  *   - `delta_recompute_sec`: the same verdicts with the base
  *     re-assigned on the fly (q177's convenience form) — the per-batch
  *     n·2√k wall the store removes;
  *   - `delta_store_partitioned_sec`: the q187 layout
  *     ([[graft.operators.Similarity.writeStandingStore]]) — the store
  *     hash-bucketed into c_bucket partition dirs, so the delta's
  *     cluster set prunes FILES (directories + row groups), not rows.
  * The base assignment uses the two-level ladder at every tier (at
  * k = 4000 a flat argmin is the n·k wall the ladder exists to remove);
  * training runs on a deterministic id-sample as in q172.
  */
object IncrementalProbe {
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

    def emb(dir: String): DataFrame = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))

    // the fixed delta batch: the q177 augmentation variants of the
    // sf0.1 embeddings, ids far above any tier's base ids
    val delta = emb("/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding"),
        explode(typedlit(Seq(1, 2, 3))).as("variant"))
      .filter((col("variant") === 1 && col("vec_id") % 5 === 0) ||
        (col("variant") === 2 && col("vec_id") % 7 === 0) ||
        (col("variant") === 3 && col("vec_id") % 14 === 0))
      .select((col("vec_id") + col("variant") * 10000000L).as("vec_id"),
        when(col("variant") === 3,
          transform(reverse(col("embedding")), v => v * lit(2.0f)))
          .when(col("variant") === 2, reverse(col("embedding")))
          .otherwise(transform(col("embedding"), v => v * lit(1.5f)))
          .as("embedding"))
      .cache()
    val nDelta = delta.count()

    def time(body: => DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => DataFrame): Double = math.min(time(body), time(body))

    val tiers = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> "/tmp/graft_sf1",
      "sf10" -> "/tmp/graft_sf10")

    val entries = tiers.flatMap { case (tag, dir) =>
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, "embeddings.parquet"))) None
      else {
        val base = emb(dir).cache()
        val n = base.count()
        val k = ((n + 49) / 50).toInt
        // deterministic sample with >= 2k training vectors (q172's rung)
        val m = math.max(1L, n / math.max(2L * k, 2000L))
        val t0 = System.nanoTime()
        val cents = Similarity.trainCentroids(
          base.filter(pmod(xxhash64(col("vec_id")), lit(m)) === 0),
          "vec_id", "embedding", k, iters = 1)
        val trainSec = (System.nanoTime() - t0) / 1e9
        val (supers, children) = Similarity.superQuantize(cents)
        val assignedBase = base
          .withColumn("cluster",
            Similarity.assignClusterTwoLevel(col("embedding"), supers,
              children).cast("long"))
          .withColumn("nrm", Similarity.norm(col("embedding")))
        val store = java.nio.file.Files
          .createTempDirectory("graft-incr-").resolve("standing").toString
        val t1 = System.nanoTime()
        // cluster-sorted layout: the pruned path's cluster-IN predicate
        // then skips row groups / partitions instead of scanning the base
        assignedBase.repartitionByRange(col("cluster"))
          .sortWithinPartitions(col("cluster"))
          .write.mode("overwrite").parquet(store)
        val buildSec = (System.nanoTime() - t1) / 1e9
        val standing = spark.read.parquet(store)
        // the q187 layout: hash-bucketed partition dirs + cluster sort,
        // so the delta's cluster set prunes FILES, not just row groups
        val pstore = java.nio.file.Files
          .createTempDirectory("graft-incr-").resolve("partitioned").toString
        val t2 = System.nanoTime()
        Similarity.writeStandingStore(assignedBase, pstore, "cluster",
          buckets = math.min(64, k))
        val buildPartSec = (System.nanoTime() - t2) / 1e9
        // the delta's assignment materialized ONCE (two-level ladder at
        // every tier), as the prepped core's contract prescribes
        val deltaAssigned = delta
          .withColumn("cluster",
            Similarity.assignClusterTwoLevel(col("embedding"), supers,
              children).cast("long"))
          .withColumn("nrm", Similarity.norm(col("embedding")))
          .cache()
        deltaAssigned.count()
        def run(b: DataFrame, prune: Boolean) =
          Similarity.semDedupIncrementalPrepped(b, deltaAssigned,
            "vec_id", "embedding", "cluster", "nrm", "cluster", "nrm",
            minCos = 0.99, pruneBaseByDeltaClusters = prune)
        val storeSec = minOf2(run(standing, prune = false))
        val prunedSec = minOf2(run(standing, prune = true))
        val partitionedSec = minOf2(
          Similarity.semDedupIncrementalStore(spark, pstore, deltaAssigned,
            "vec_id", "embedding", "cluster", "nrm", minCos = 0.99))
        val recomputeSec = minOf2(run(assignedBase, prune = false))
        // base rows each layout makes a batch SCAN — the deterministic
        // I/O bound (at probe scale wall time is verdict-DAG overhead,
        // so rows-scanned is the honest scale metric): full layout reads
        // n per batch; the pruned partitioned read is bounded by the
        // batch's cluster footprint
        def touchedOf(d: DataFrame): Seq[Long] = d.select(col("cluster"))
          .distinct().collect().map(_.getLong(0)).toSeq
        val bigTouched = touchedOf(deltaAssigned)
        val bigPrunedRows = Similarity.readStandingStorePruned(spark,
          pstore, bigTouched).count()
        // the SMALL-batch regime pruning exists for: ~32 rows touch ≤32
        // of the k clusters (the 829-row batch above touches ~800 — at
        // k=4000 that is every one of the 64 buckets, so nothing prunes)
        val smallDelta = deltaAssigned
          .orderBy(col("vec_id")).limit(32).cache()
        smallDelta.count()
        def runSmall(b: DataFrame) =
          Similarity.semDedupIncrementalPrepped(b, smallDelta,
            "vec_id", "embedding", "cluster", "nrm", "cluster", "nrm",
            minCos = 0.99)
        val smallStoreSec = minOf2(runSmall(standing))
        val smallPartSec = minOf2(
          Similarity.semDedupIncrementalStore(spark, pstore, smallDelta,
            "vec_id", "embedding", "cluster", "nrm", minCos = 0.99))
        val smallPrunedRows = Similarity.readStandingStorePruned(spark,
          pstore, touchedOf(smallDelta)).count()
        smallDelta.unpersist()
        deltaAssigned.unpersist()
        base.unpersist()
        Some(f""""$tag":{"n":$n,"k":$k,"train_sec":$trainSec%.2f,""" +
          f""""build_store_sec":$buildSec%.2f,""" +
          f""""delta_store_sec":$storeSec%.2f,""" +
          f""""delta_store_pruned_sec":$prunedSec%.2f,""" +
          f""""build_partitioned_sec":$buildPartSec%.2f,""" +
          f""""delta_store_partitioned_sec":$partitionedSec%.2f,""" +
          f""""base_rows_full_scan":$n,""" +
          f""""base_rows_pruned_big_batch":$bigPrunedRows,""" +
          f""""small_batch_store_sec":$smallStoreSec%.2f,""" +
          f""""small_batch_partitioned_sec":$smallPartSec%.2f,""" +
          f""""base_rows_pruned_small_batch":$smallPrunedRows,""" +
          f""""delta_recompute_sec":$recomputeSec%.2f}""")
      }
    }
    println(s"""{"probe":"incremental_dedup_curve","n_delta":$nDelta,""" +
      entries.mkString(",") + "}")
    spark.stop()
  }
}
