package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN trainer path: k-means codebook recovery and the trained IVF probe
  * agreeing with brute force on cluster-separated data. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two well-separated blobs around (0,0,…) and (10,10,…)
  private def blobs() = {
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Seq.tabulate(4)(d => (base + (i % 5) * 0.1 + d * 0.01).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("trainCentroids recovers separated clusters deterministically") {
    val df = blobs()
    val cents = Similarity.trainCentroids(df, "vec_id", "embedding", k = 2, iters = 4)
    assert(cents.length == 2)
    // one centroid near 0, one near 10 (order fixed by deterministic init)
    val means = cents.map(_.sum / 4)
    assert(means.exists(m => m < 1.0) && means.exists(m => m > 9.0))
    // deterministic: retraining yields the identical codebook
    assert(cents == Similarity.trainCentroids(df, "vec_id", "embedding", 2, 4))
  }

  test("seedFarthestFirst spreads seeds across blobs, deterministically") {
    val df = blobs()
    val seeds = Similarity.seedFarthestFirst(df, "vec_id", "embedding", k = 2)
    val means = seeds.map(_.sum / 4)
    // first seed = lowest id (blob 0); second = farthest point (blob 1)
    assert(means.head < 1.0 && means(1) > 9.0)
    assert(seeds == Similarity.seedFarthestFirst(df, "vec_id", "embedding", 2))
    // ++-seeded training converges to the same separated codebook
    val cents = Similarity.trainCentroids(df, "vec_id", "embedding", k = 2,
      iters = 4, init = Some(seeds))
    val cmeans = cents.map(_.sum / 4)
    assert(cmeans.exists(_ < 1.0) && cmeans.exists(_ > 9.0))
  }

  test("embedNearDupPairs finds exactly the scaled twins, never all-pairs") {
    val df = blobs()
    // twins of the even ids, scaled ×2: same direction, cos ≈ 1
    val twins = df.filter(col("vec_id") % 2 === 0)
      .select((col("vec_id") + 1000).as("vec_id"),
        transform(col("embedding"), v => v * lit(2.0f)).as("embedding"))
    val pairs = Similarity.embedNearDupPairs(df.unionByName(twins),
        "vec_id", "embedding", dim = 4, bands = 4, bitsPerBand = 4,
        minCos = 0.999999)
      .orderBy("id_a", "id_b").collect()
    // every twin pair recovered (scale-invariant buckets ⇒ recall 1)
    val twinPairs = pairs.map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => b == a + 1000 }
    assert(twinPairs.toSeq == (0 until 20 by 2).map(i => (i.toLong, i + 1000L)))
    // every emitted pair really clears the threshold (precision by verify)
    assert(pairs.forall(_.getDouble(2) >= 0.999999))
    // and the blob data itself has near-parallel in-blob vectors the LSH may
    // surface — but nothing across blobs below the threshold
    assert(pairs.forall(r => r.getDouble(2) <= 1.0 + 1e-12))
  }

  test("multi-probe IVF: nProbe=nlist equals brute force; nProbe=1 equals single-probe") {
    val df = blobs()
    val queries = df.filter(col("vec_id") < 2)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // full probing degenerates to exact brute force
    assert(pairs(Similarity.ivfTopKMultiProbe(queries, df, "vec_id", "embedding",
        k = 3, nlist = 2, nProbe = 2, iters = 4)) ==
      pairs(Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 3)))
    // single probe matches the single-probe trained path
    assert(pairs(Similarity.ivfTopKMultiProbe(queries, df, "vec_id", "embedding",
        k = 3, nlist = 2, nProbe = 1, iters = 4)) ==
      pairs(Similarity.ivfTopKTrained(queries, df, "vec_id", "embedding",
        k = 3, nlist = 2, iters = 4)))
  }

  test("ivfTopKTrained matches brute force within the query's blob") {
    val df = blobs()
    val queries = df.filter(col("vec_id") < 2)
    val got = Similarity.ivfTopKTrained(queries, df, "vec_id", "embedding",
        k = 3, nlist = 2, iters = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute force restricted to the same blob (even ids ↔ blob 0, odd ↔ blob 1)
    val expected = Similarity.bruteForceTopK(queries, df, "vec_id", "embedding", k = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (q, n) => (q % 2) == (n % 2) } // same blob only
      .groupBy(_._1).view.mapValues(_.take(3)).values.flatten.toSet
    assert(got.length == 6) // 2 queries × 3 neighbors
    assert(got.forall(expected.contains))
  }
}
