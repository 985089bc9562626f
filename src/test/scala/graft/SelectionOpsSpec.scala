package graft

import graft.operators.{Dedup, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Corpus-selection operators (q131-q135 family): canonical pick per dup
  * group, budget allocation, kNN graph, quantized ranking. */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalPick keeps the best score, ties to the lowest id") {
    val corpus = Seq(
      (1L, "x", 10L), (2L, "x", 30L), (3L, "x", 20L), // component {1,2,3}
      (4L, "y", 5L),                                  // singleton
      (5L, "z", 7L), (6L, "z", 7L)                    // tied pair
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val picked = Dedup.canonicalPick(corpus, "doc_id", pairs, "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(picked(1L) == ((3L, 2L, 30L, 2L))) // group 1: doc 2 wins on score
    assert(picked(4L) == ((1L, 4L, 5L, 0L)))  // singleton keeps itself
    assert(picked(5L) == ((2L, 5L, 7L, 1L)))  // tie -> lowest id
  }

  test("budgetAllocate: exact Hamilton split, greedy fill keeps docs whole") {
    // strata weights 10 / 7 / 3 (W=20), budget 1/2 -> B=10:
    // base = 5, 3, 1 (sum 9); remainders 0, 10, 10 -> leftover unit goes
    // to the LEXICOGRAPHICALLY FIRST of the tied largest remainders (b)
    val docs = Seq(
      ("a", 1L, 4L), ("a", 2L, 6L),
      ("b", 3L, 7L),
      ("c", 4L, 3L)
    ).toDF("src", "doc_id", "n_tokens")
    val out = Sampling.budgetAllocate(docs, "src", "doc_id", "n_tokens",
        num = 1, den = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("a")._1 == 10L && out("b")._1 == 7L && out("c")._1 == 3L)
    assert(out("a")._2 + out("b")._2 + out("c")._2 == 10L) // allocs sum to B
    assert(out("b")._2 == 4L && out("c")._2 == 1L) // b takes the leftover
    // greedy fill: first hash-ordered doc always selected (starts at 0 <
    // alloc when alloc > 0), kept whole even when it overshoots
    assert(out("b")._3 == 1L && out("b")._4 == 7L) // 7 tokens vs alloc 4
    assert(out("c")._3 == 1L && out("c")._4 == 3L)
    assert(out("a")._3 >= 1L && out("a")._4 >= 4L)
  }

  test("budgetAllocate rejects bad fractions; zero-alloc strata select 0") {
    val docs = Seq(("a", 1L, 5L)).toDF("src", "doc_id", "n_tokens")
    intercept[IllegalArgumentException] {
      Sampling.budgetAllocate(docs, "src", "doc_id", "n_tokens", 3, 2)
    }
    // W=9, B=0 with num=1/den=10 -> every stratum allocates and selects 0
    val tiny = Seq(("a", 1L, 4L), ("b", 2L, 5L)).toDF("src", "doc_id", "n_tokens")
    val zero = Sampling.budgetAllocate(tiny, "src", "doc_id", "n_tokens", 1, 10)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(zero.forall(_ == ((0L, 0L, 0L))))
  }

  test("knnGraph: cluster-blocked neighbors, mutual degree, no cross edges") {
    // cluster 0: three vectors where 1<->2 are mutually nearest;
    // cluster 1: an isolated pair (trivially mutual); cluster 2: a
    // SINGLETON that must still appear (zero degrees, null neighbor)
    val emb = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 0), (3L, Seq(0f, 1f), 0),
      (10L, Seq(1f, 1f), 1), (11L, Seq(1f, 0.9f), 1),
      (20L, Seq(0.5f, 0.5f), 2)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnGraph(emb, "vec_id", "embedding", "label", k = 1)
      .collect()
    val g = rows.map(r => r.getLong(0) ->
      (r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(g(1L)._4 == 2L && g(2L)._4 == 1L)       // top neighbors
    assert(g(1L)._3 == 1L && g(2L)._3 == 1L)       // mutual edge
    assert(g(3L)._4 == 2L && g(3L)._3 == 0L)       // 3 lists 2, 2 doesn't list 3
    assert(g(10L)._3 == 1L && g(11L)._3 == 1L)     // pair cluster is mutual
    assert(g(20L) == ((2, 0L, 0L, -1L)))           // singleton kept, zeroed
    assert(g.filterNot(_._1 == 20L).values.forall(_._2 == 1L))
  }

  test("aHash + hammingNearDup: identical images pair at distance 0") {
    import graft.operators.Multimodal
    val df = Seq(
      (1L, Multimodal.syntheticBmp(5L, 16, 16)),
      (2L, Multimodal.syntheticBmp(5L, 16, 16)),   // byte-identical twin
      (3L, Multimodal.syntheticBmp(999L, 16, 16))
    ).toDF("id", "payload")
    val sig = Multimodal.extractAHash(df, "payload")
      .select(col("id"), col("ahash").as("simhash"))
    val hashes = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    val pairs = Dedup.hammingNearDup(sig, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
    // uniform image: no block mean exceeds the global mean -> hash 0
    val flat = Seq((9L, {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(100, 100, 100))
      g.fillRect(0, 0, 16, 16); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos); bos.toByteArray
    })).toDF("id", "payload")
    val h9 = Multimodal.extractAHash(flat, "payload")
      .collect()(0).getAs[Long]("ahash")
    assert(h9 == 0L)
  }

  test("audio energy hash: twins collide, flat audio hashes to 0") {
    import graft.operators.Multimodal
    val df = Seq(
      (1L, Multimodal.syntheticWav(5L, 640)),
      (2L, Multimodal.syntheticWav(5L, 640)),     // identical twin
      (3L, Multimodal.syntheticWav(999L, 704))
    ).toDF("id", "payload")
    val sig = Multimodal.extractAudioHash(df, "payload")
      .select(col("id"), col("ahash").as("simhash"))
    val hashes = sig.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    val pairs = Dedup.hammingNearDup(sig, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)))
    // constant signal: every frame mean equals the global mean -> 0
    assert(Multimodal.audioEnergyHash64(Array.fill(128)(100.toShort), 1) == 0L)
    // non-WAV payload -> null hash, dropped from pairing
    val junk = Seq((7L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    assert(Multimodal.extractAudioHash(junk, "payload")
      .collect()(0).isNullAt(2))
  }

  test("quantTopK ranks like the exact cosine on well-separated vectors") {
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1L)
    val ranked = Similarity.quantTopK(q, corpus, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(ranked.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
    // identical-direction pair scores exactly 1.0 in integer arithmetic
    val twin = Seq((1L, Seq(2f, 4f)), (2L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val qc = Similarity.quantTopK(twin.filter(col("vec_id") === 1L), twin,
      "vec_id", "embedding", k = 1).collect()(0).getDouble(2)
    assert(qc == 1.0d)
  }
}
