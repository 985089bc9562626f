package graft

import graft.operators.{Dedup, Multimodal, Sampling, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-style laws for the selection-layer cores, on seeded random
  * inputs (same deterministic-Gen discipline as NativeParitySpec): the
  * Hamilton allocation quota law, the Hamming banding exactness law,
  * span-coverage vs brute-force interval union, and the hash/quantizer
  * invariances. */
class SelectionLawsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("Hamilton law: allocations sum to B and stay within 1 of quota") {
    val strataGen = for {
      k <- Gen.choose(2, 12)
      ws <- Gen.listOfN(k, Gen.choose(1L, 5000L))
    } yield ws
    (1L to 5L).foreach { seed =>
      val weights = sample(strataGen, seed).zipWithIndex
      val docs = weights.map { case (w, i) => (s"s$i", i.toLong, w) }
        .toDF("src", "doc_id", "n_tokens")
      for ((num, den) <- Seq((1L, 2L), (1L, 3L), (2L, 3L))) {
        val rows = Sampling.budgetAllocate(docs, "src", "doc_id",
            "n_tokens", num, den)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        val tw = rows.map(_._2).sum
        val b = tw * num / den
        assert(rows.map(_._3).sum == b, s"seed=$seed $num/$den: sum != B")
        rows.foreach { case (s, w, alloc) =>
          val base = b * w / tw
          assert(alloc == base || alloc == base + 1,
            s"seed=$seed $s: alloc $alloc not in {$base, ${base + 1}}")
        }
      }
    }
  }

  test("tempered allocation also satisfies the quota law on isqrt shares") {
    val docs = Seq(("a", 1L, 3000L), ("b", 2L, 740L), ("c", 3L, 13L),
      ("d", 4L, 99999L)).toDF("src", "doc_id", "n_tokens")
    val rows = Sampling.temperedAllocate(docs, "src", "doc_id",
        "n_tokens", 1, 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    val w = rows.map(_._1)
    val t = w.map(x => math.sqrt(x.toDouble).toLong)
    val b = w.sum / 2
    assert(rows.map(_._2).sum == b)
    rows.zip(t).foreach { case ((_, alloc), ts) =>
      val base = b * ts / t.sum
      assert(alloc == base || alloc == base + 1)
    }
  }

  test("Hamming banding is exact: banded pairs == brute force at dist <= 3") {
    val sigGen = Gen.listOfN(60, Gen.oneOf(
      Gen.long, // far-apart signatures
      Gen.choose(0L, 15L).map(b => 0x0123456789ABCDEFL ^ (1L << b)), // near-dups
      Gen.const(0x0123456789ABCDEFL)))
    (1L to 3L).foreach { seed =>
      val sigs = sample(sigGen, seed).zipWithIndex
        .map { case (h, i) => (i.toLong, h) }
      val banded = Dedup.hammingNearDup(sigs.toDF("id", "simhash"), maxDist = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        (ida, ha) <- sigs; (idb, hb) <- sigs if ida < idb
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (ida, idb, d.toLong)).toSet
      assert(banded == brute, s"seed=$seed: ${banded.size} vs ${brute.size}")
    }
  }

  test("contamSpanCoverage equals brute-force interval union") {
    // small alphabet => dense n-gram collisions; single spaces keep the
    // normalization trivial to mirror
    val docGen = Gen.choose(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(14, docGen)
    (1L to 3L).foreach { seed =>
      val texts = sample(corpusGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t, if (i % 3 == 0) "test" else "train") }
      val out = TextOps.contamSpanCoverage(
          texts.toDF("doc_id", "text", "split"),
          "doc_id", "text", "split", "train", "test", n = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // brute force: replicate shingles + union per test doc
      def grams(t: String): Seq[(Int, String)] = {
        val toks = t.split(" ").toSeq
        val nG = math.max(toks.length - 3, 0) + 1
        (0 until nG).map(i => i -> toks.slice(i, i + 3).mkString(" "))
      }
      val trainSet = texts.filter(_._3 == "train").flatMap(d => grams(d._2))
        .map(_._2).toSet
      texts.filter(_._3 == "test").foreach { case (id, t, _) =>
        val toks = t.split(" ")
        val covered = grams(t).filter(g => trainSet(g._2))
          .flatMap { case (p, _) => p until math.min(p + 3, toks.length) }
          .toSet.size.toLong
        assert(out(id) == ((toks.length.toLong, covered)),
          s"seed=$seed doc=$id: ${out(id)} vs (${toks.length}, $covered)")
      }
    }
  }

  test("hash invariances: brightness/amplitude scaling, channel duplication") {
    // audio: doubling every sample scales every energy by 4 -> same hash
    val pcm = sample(Gen.listOfN(256, Gen.choose(-8000, 8000)), 7L)
      .map(_.toShort).toArray
    val doubled = pcm.map(s => (s * 2).toShort)
    assert(Multimodal.audioEnergyHash64(pcm, 1) ==
      Multimodal.audioEnergyHash64(doubled, 1))
    // mono -> duplicated-channel stereo: per-frame energy doubles uniformly
    val stereo = pcm.flatMap(s => Array(s, s))
    assert(Multimodal.audioEnergyHash64(pcm, 1) ==
      Multimodal.audioEnergyHash64(stereo, 2))
    // quantized ranking is invariant to power-of-two vector scaling
    val corpus = Seq(
      (1L, Seq(0.3f, 0.1f, -0.2f)), (2L, Seq(0.25f, 0.15f, -0.18f)),
      (3L, Seq(-0.1f, 0.9f, 0.4f)), (4L, Seq(0.5f, -0.5f, 0.1f))
    ).toDF("vec_id", "embedding")
    val scaled = corpus.select(col("vec_id"),
      transform(col("embedding"), v => v * lit(4f)).as("embedding"))
    def rank(df: org.apache.spark.sql.DataFrame) =
      Similarity.quantTopK(df.filter(col("vec_id") === 1L), df,
          "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(rank(corpus) == rank(scaled))
  }
}
