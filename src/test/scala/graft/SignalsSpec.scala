package graft

import graft.operators.Signals
import org.apache.spark.sql.functions._

/** Laws for the curation-signal cores ([[graft.operators.Signals]]):
  * PageRank's closed form on a symmetric graph and its mass bounds on an
  * arbitrary one, the hashed-classifier feature count (including the
  * sequence(1,0) bigram guard), the all-target fixed point of the
  * importance weights, RRF dominance, TF-IDF ranking, and the
  * compaction planner's partition/contiguity/fill guarantees. */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private val scale = 1000000000000L
  private val base  = 150000000000L

  test("pageRank: ring graph hits the uniform closed form") {
    val n = 40
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val out = Signals.pageRank(nodes, "id", edges, "src", "dst", iters = 3)
      .collect()
    // Symmetry: every node has one in/out edge, so ranks stay uniform and
    // each iteration is the scalar map r -> base + (r*85) div 100.
    var r = scale
    for (_ <- 1 to 3) r = base + r * 85 / 100
    assert(out.length == n)
    out.foreach { row =>
      assert(row.getLong(1) == 1 && row.getLong(2) == 1)
      assert(row.getLong(3) == r, s"node ${row.getLong(0)}: ${row.getLong(3)} != $r")
    }
  }

  test("pageRank: mass bounds and dangling leak on an arbitrary graph") {
    val nodes = (0L to 9L).toDF("id")
    // node 9 dangles (no out-edges); hub 0 receives from everyone
    val edges = (1L to 8L).flatMap(i => Seq((i, 0L), (i, i % 3 + 1)))
      .toDF("src", "dst")
    val out = Signals.pageRank(nodes, "id", edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val total = out.values.sum
    assert(total <= 10 * scale, "mass grew")
    assert(out.values.forall(_ >= base), "every node keeps its base rank")
    assert(out(0L) > out(9L), "hub outranks the dangling node")
  }

  test("hits: ring graph is the uniform fixed point; star separates roles") {
    val n = 16
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    // uniform in/out degree: sums stay uniform, max-normalization maps
    // every value back to exactly `scale`
    operators.Signals.hits(nodes, "id", ring, "src", "dst", iters = 2)
      .collect().foreach { r =>
        assert(r.getLong(1) == 1000000L && r.getLong(2) == 1000000L)
      }
    // star with edges leaf -> center: the center is pure authority,
    // the leaves pure hubs
    val star = (1L to 5L).map(i => (i, 0L)).toDF("src", "dst")
    val out = operators.Signals.hits((0L to 5L).toDF("id"), "id",
        star, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L)._1 == 1000000L && out(0L)._2 == 0L) // center: authority
    (1L to 5L).foreach(i => assert(out(i)._1 == 0L && out(i)._2 == 1000000L))
  }

  test("hashedLogit: n_feats = 2*len - 1; single-token doc has one feature") {
    val docs = Seq((1L, "alpha"), (2L, "alpha beta"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = Signals.hashedLogit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L) // no phantom bigram from sequence(1, 0)
    assert(out(2L) == 3L)
    assert(out(3L) == 7L)
  }

  test("hashedLogit: invariant under repartitioning") {
    val docs = (0L until 50L).map(i => (i, s"tok$i common word ${i % 7}"))
      .toDF("doc_id", "text")
    val a = Signals.hashedLogit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Signals.hashedLogit(docs.repartition(13), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("importanceWeights: all-target corpus is the 10^6 fixed point") {
    val docs = Seq((1L, "x y z"), (2L, "p q")).toDF("doc_id", "text")
    val out = Signals.importanceWeights(docs, "doc_id", "text", lit(true))
      .collect()
    // w(b) = ((c+1)*10^6) div (c+1) = 10^6 for every bucket, so the
    // truncated mean is exactly 10^6 for every doc.
    out.foreach(r => assert(r.getLong(2) == 1000000L))
  }

  test("rrfFuse: a doc ranked first by both rankers dominates") {
    val r1 = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq((1L, 10L, 1L), (1L, 12L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Signals.rrfFuse(Seq(r1, r2), k = 10)
      .orderBy(col("rank")).collect()
    assert(out.head.getLong(2) == 10L && out.head.getLong(4) == 2L)
    // 2 * (10^6 div 61) vs 10^6 div 62 for the singletons
    assert(out.head.getLong(3) == 2 * (1000000L / 61))
    out.tail.foreach(r => assert(r.getLong(3) == 1000000L / 62))
  }

  test("tfidfKeywords: a doc-unique term outranks a corpus-wide one") {
    val docs = Seq((1L, "shared zebra zebra"), (2L, "shared a"),
      (3L, "shared b")).toDF("doc_id", "text")
    val out = Signals.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy(col("rank")).collect()
    assert(out(0).getString(2) == "zebra") // tf=2, df=1 beats tf=1, df=3
    assert(out(1).getString(2) == "shared")
    assert(out.length == 2)
  }

  test("prioritySample: equal weights reduce to the uniform hash-order pick") {
    val docs = (0L until 60L).map(i => (s"s${i % 2}", i, 10L))
      .toDF("src", "doc_id", "w")
    val picks = operators.Sampling.prioritySample(docs, "src", "doc_id",
        "w", k = 5, seed = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // with constant weight, priority order IS hash order
    val h = operators.Sampling.keyHashFor(docs, "doc_id", 7L)
    val expected = docs.withColumn("h", h)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("r") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(3).toLong, r.getLong(1)))
      .toSet
    assert(picks.map(p => (p._1, p._3)) == expected.map(e => (e._1, e._3)))
  }

  test("prioritySample: non-positive weight fails fast, not silently") {
    val docs = Seq(("g", 1L, 3L), ("g", 2L, 0L)).toDF("src", "doc_id", "w")
    val e = intercept[Exception] {
      operators.Sampling.prioritySample(docs, "src", "doc_id", "w", 2, 7L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be > 0")))
  }

  test("prioritySample: fractional weight type rejected at plan build") {
    // 0.5 would truncate to 0 (misleading "must be > 0") and 2.7 to 2
    // (silent distribution skew) — the TYPE is rejected before any of
    // that can happen, with a message naming the real problem
    val docs = Seq(("g", 1L, 0.5), ("g", 2L, 2.7)).toDF("src", "doc_id", "w")
    val e = intercept[IllegalArgumentException] {
      operators.Sampling.prioritySample(docs, "src", "doc_id", "w", 2, 7L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("prioritySample: invariant under repartitioning, rank bounded by k") {
    val docs = (0L until 80L).map(i => ("g", i, 1L + i % 9)).toDF("src", "doc_id", "w")
    val a = operators.Sampling.prioritySample(docs, "src", "doc_id", "w", 7, 5L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val b = operators.Sampling.prioritySample(docs.repartition(11), "src",
        "doc_id", "w", 7, 5L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.size == 7 && a.forall(_._1 <= 7))
  }

  test("anchorProfile: counts linkers and breaks keyword ties by name") {
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val attrs = Seq((1L, "web", "zeta"), (2L, "web", "alpha"),
      (3L, "book", "zeta")).toDF("doc_id", "source", "kw")
    val out = operators.Signals.anchorProfile(edges, "src", "dst", attrs,
      "doc_id", "source", "kw").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2) // in_deg, n_sources
    assert(r.getString(3) == "zeta" && r.getLong(4) == 2)
    // tie at n=2 vs n=1: zeta wins on count, not name
  }

  test("twoHopReach: ring graph reaches exactly 2") {
    val n = 20
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val out = operators.Signals.twoHopReach(nodes, "id", edges, "src", "dst")
      .collect()
    assert(out.length == n)
    out.foreach(r => assert(r.getLong(1) == 1 && r.getLong(2) == 2))
  }

  test("stopwordDensity: a universal term is discovered; density exact") {
    val docs = Seq((1L, "the cat"), (2L, "the dog runs"), (3L, "the"))
      .toDF("doc_id", "text")
    val out = operators.Signals.stopwordDensity(docs, "doc_id", "text", 50L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "the" is in 3/3 docs (>= 50%); every other term is in 1/3 (< 50%)
    assert(out(1L) == ((2L, 1L, 500000L)))
    assert(out(2L) == ((3L, 1L, 666666L)))
    assert(out(3L) == ((1L, 1L, 0L)))
  }

  test("pqTopK: with ksub = n the codes are exact and PQ = brute-force L2") {
    // when every vector seeds its own cluster, the Lloyd step leaves each
    // centroid on its vector, codes are the identity, and ADC degenerates
    // to the exact squared distance — so the PQ ranking must equal the
    // exact ranking
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 8L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val pq = operators.Similarity.pqTopK(df.filter(col("vec_id") < 3), df,
        "vec_id", "embedding", m = 2, dsub = 4, ksub = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = vecs.flatMap { case (q, qv) =>
      if (q >= 3) Nil else vecs.filter(_._1 != q).map { case (n, nv) =>
        val d = qv.zip(nv).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
        (q, n, d)
      }.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((_, n, _), i) => (q, i + 1L, n) }
    }.toSet
    assert(pq.toSet == exact)
  }

  test("pqCodebooks: m·ksub rows, dsub-wide centroids, repartition-stable") {
    val rnd = new scala.util.Random(3)
    val df = (0L until 40L).map(i => (i, Array.fill(12)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    def cb(d: org.apache.spark.sql.DataFrame) =
      operators.Similarity.pqCodebooks(d, "vec_id", "embedding",
          m = 3, dsub = 4, ksub = 4)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2)))
        .toMap
    val a = cb(df)
    val b = cb(df.repartition(7))
    assert(a.size == 12 && a.values.forall(_.length == 4))
    assert(a == b)
  }

  test("bloom bitmaps: no false negatives across shards") {
    val keys = (0L until 100L).map(i => (i % 4, s"key-$i")).toDF("shard", "k")
    val bitmaps = operators.Bloom.buildBitmaps(keys, "shard", "k",
      numBits = 1024, numHashes = 3, seed = 5L)
    val hits = keys.join(bitmaps, "shard")
      .withColumn("hit", operators.Bloom.mightContain(col("bloom"),
        operators.Dedup.polyHash(col("k")), 1024, 3, 5L))
      .filter(!col("hit")).count()
    assert(hits == 0L, "a present key missed its own shard's filter")
  }

  test("hll: split-merge equals whole-corpus sketch; estimate sane") {
    import operators.Sketches
    // seeded RANDOM keys: dense consecutive ranges carry the Knuth
    // hash's low-bit lattice into the rank field and bias the estimate
    // high (~1.7x measured) — documented in hllSketch's Scaladoc
    val rnd = new scala.util.Random(7)
    val distinctKeys = Seq.fill(4000)(rnd.nextInt(Int.MaxValue).toLong)
      .distinct.take(1900)
    val keys = (distinctKeys ++ distinctKeys.take(600))
      .map(k => ("g", k)).toDF("g", "k")
    val whole = Sketches.hllRegisters(keys, Seq("g"), "k")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val a = Sketches.hllRegisters(keys.filter(col("k") % 2 === 0), Seq("g"), "k")
    val b = Sketches.hllRegisters(keys.filter(col("k") % 2 =!= 0), Seq("g"), "k")
    val merged = a.unionByName(b).groupBy(col("g"), col("j"))
      .agg(max(col("mj")).as("mj"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(merged == whole, "register merge by max != whole-corpus registers")
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(keys, Seq("g"), "k"), Seq("g"))
      .collect()(0).getAs[Double]("hll_est")
    // 64 registers -> ~13% standard error; 1900 distinct random keys
    assert(est > 1900 * 0.6 && est < 1900 * 1.4, s"estimate $est way off 1900")
  }

  test("bipartiteProject: hot users excluded, support respected, symmetric-free") {
    val log = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 11L), // dup row
      (3L, 10L), (3L, 12L),
      (9L, 10L), (9L, 11L), (9L, 12L), (9L, 13L) // hot user, cap 3
    ).toDF("u", "i")
    val out = operators.Signals.bipartiteProject(log, "u", "i",
        maxItemsPerUser = 3L, minSupport = 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // user 9 (4 items) excluded; (10,11) seen by users 1 and 2 -> 2;
    // (10,12) only user 3 -> below support
    assert(out == Map((10L, 11L) -> 2L))
  }

  test("calibrateScores: midpoint-rank ppm, tie-consistent, mean-centered") {
    val scores = Seq(1L, 1L, 2L, 3L, 3L, 3L, 7L, 9L)
    val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val out = operators.Signals.calibrateScores(df, "s")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // score 1: below=0, eq=2 -> (0*2+2)*1e6/(2*8) = 125000
    assert(out(1L) == 125000L)
    // score 3: below=3, eq=3 -> (6+3)*1e6/16 = 562500
    assert(out(3L) == 562500L)
    // score 9: below=7, eq=1 -> 15*1e6/16 = 937500
    assert(out(9L) == 937500L)
    // midpoint convention: the ppm-weighted doc count averages to ~1/2
    val mean = operators.Signals.calibrateScores(df, "s")
      .agg(avg(col("calib_ppm"))).collect()(0).getDouble(0)
    assert(math.abs(mean - 500000.0) < 1.0)
  }

  test("nfcNormalize: composes combining marks, idempotent, null-safe") {
    import operators.TextOps
    val df = Seq(
      (1L, "cafe\u0301"),   // decomposed: e + combining acute
      (2L, "caf\u00e9"),    // precomposed
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = df.withColumn("n", TextOps.nfcNormalize(col("t")))
      .withColumn("n2", TextOps.nfcNormalize(col("n")))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(out(1L)._1.contains("caf\u00e9"), "combining mark not composed")
    assert(out(2L)._1.contains("caf\u00e9"))
    assert(out(3L)._1.contains("plain ascii"))
    assert(out(4L)._1.isEmpty, "null must stay null")
    out.values.foreach { case (n, n2) => assert(n == n2, "not idempotent") }
  }

  test("compactionPlan: bins partition the files, contiguously, near target") {
    val target = 100L
    val files = (0 until 30).map(i => ("g", i.toLong, 17L + (i % 5) * 13L))
      .toDF("grp", "file_id", "bytes")
    val plan = Signals.compactionPlan(files, "grp", "file_id", "bytes", target)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val inputBytes = files.agg(sum(col("bytes"))).collect()(0).getLong(0)
    assert(plan.map(_._2).sum == 30 && plan.map(_._3).sum == inputBytes)
    // contiguity: each bin's file range ends before the next begins
    plan.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB)
      case _ =>
    }
    // fill: every non-tail bin crossed the target once its first file's
    // prefix is accounted for (bins can undershoot by at most one file)
    val maxFile = 17L + 4 * 13L
    plan.init.foreach { case (_, _, bytes, _, _) =>
      assert(bytes > target - maxFile, s"bin too small: $bytes")
    }
  }
}
