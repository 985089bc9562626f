package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, designed
  * partition-parallel for 100 TB corpora:
  *
  *  - exact: hash-groupBy on a text fingerprint (one shuffle on the hash,
  *    map-side combine);
  *  - n-gram Jaccard: shingle explode → self-join on shingle → per-pair
  *    intersection counts (shuffle on shingle; frequent-shingle cap bounds
  *    skew);
  *  - MinHash+LSH: shingle → K minhashes → B bands → candidate pairs per
  *    band bucket → exact-Jaccard verification (shuffles bounded by band
  *    buckets instead of the full pair matrix);
  *  - SimHash: 64-bit signature, banded by 16-bit chunks for Hamming ≤ k
  *    candidate generation.
  *
  * No driver-side collect anywhere; every stage is a DataFrame op.
  *
  * Cache lifecycle: the pair generators cache the shared shingle/signature
  * relation (consumed by both the candidate join and the verification
  * stage — recomputing it would double the dominant shuffle). The cache is
  * bounded by that relation's size, not the corpus (hashes, not text).
  * Each generator has two forms: a `...Scoped` variant returning a
  * [[CachedResult]] handle that owns the cache (release with `close()`,
  * or borrow with `use` — the right form for long-lived sessions, as
  * [[graft.pipeline.CurationPipeline]] does), and a plain-DataFrame
  * variant for one-shot consumers that clear the session cache between
  * stages (`spark.catalog.clearCache()`, as Bench does between queries).
  */
object Dedup {

  /** Max literal values per pushed-down IN list (candidate ids into the
    * shingle sidecar scan, per-band signatures into the band-index
    * scan). Spark expands a pushed IN to a left-deep OR chain in the
    * parquet filter, so list length IS recursion depth at evaluation —
    * 4000 overflowed an executor stack; 1000 is comfortably under any
    * default stack while still covering the small continuous batches
    * whose per-batch flatness the pushdown exists for. Keep
    * `spark.sql.parquet.pushdown.inFilterThreshold` >= this (sessions
    * here set 1024) or the list never reaches the reader. */
  private val PushdownCap = 1000

  /** A result DataFrame whose plan reads cached relations owned by the
    * callee. `close()` unpersists them (idempotent, lazy-safe: Spark
    * recomputes if the plan is re-executed afterwards); `use` is the
    * borrow form — run the consumer, then release in `finally`. */
  final class CachedResult private[graft] (val df: DataFrame,
      caches: Seq[DataFrame]) extends AutoCloseable {
    override def close(): Unit = caches.foreach(_.unpersist(blocking = true))
    def use[T](f: DataFrame => T): T = try f(df) finally close()
    /** True while any backing relation is still registered as cached. */
    def isCached: Boolean =
      caches.exists(_.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
  }

  /** Word n-gram shingles of the normalized text — one native codegen'd
    * pass ([[graft.plans.ShingleArray]]; the declarative
    * transform/slice/concat_ws tree evaluated interpreted per shingle,
    * which dominated every Jaccard-family scan). */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.ShingleArray(GraftColumnBridge.expression(text), n))
  }

  /** Per-shingle 64-bit hashes, fused shingle+hash in one codegen pass
    * ([[graft.plans.ShingleHashArray]]) — values bit-identical to
    * hashing [[shingles]] elementwise (`xxhash64` for `poly = false`,
    * [[polyHash]] for `poly = true`) without materializing a string per
    * shingle: the hashes run over slices of the one normalized per-doc
    * buffer. */
  def shingleHashArr(text: Column, n: Int, poly: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.ShingleHashArray(GraftColumnBridge.expression(text), n, poly))
  }

  /** Exact dedup: keep the lowest-id representative per fingerprint.
    * Returns (fingerprint, keep_id, n_copies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs — the base relation for Jaccard-family
    * dedup. */
  def docShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))
      .distinct()

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ threshold. The
    * self-join is on the 64-bit shingle hash — shuffling 8-byte longs
    * where shingle STRINGS (~n words each) used to cross both the
    * distinct and the self-join exchanges (guide §2.3: shuffle keys,
    * not payloads); `maxShingleFreq` caps a shingle's document
    * frequency to bound skew. Hash-keyed counting is the same
    * equivalence the verified q21 path has always used: common/n_sh
    * counts differ from string counts only if two DIFFERENT shingles
    * collide in the 64-bit space (2⁻⁶⁴ per pair; the oracle confirms
    * equality on the gated corpora). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleFreq: Int = 1000): DataFrame =
    ngramJaccardPairsScoped(df, idCol, textCol, n, threshold, maxShingleFreq).df

  /** [[ngramJaccardPairs]] with a SCALE ESCAPE HATCH — the cascade's
    * near-dup stage at 100 TB: the exact shingle self-join's candidate
    * space grows with DUPLICATE DENSITY (every doc pair sharing any
    * shingle is a candidate), which is what made the q163 cascade 29×
    * for 100× data at sf10. Above `graft.dedup.bandedAbove` documents
    * (default 100000) pair GENERATION routes through MinHash banding
    * (the q21 machinery, 32 hashes × 16 bands = 2 rows/band —
    * collision probability s² per band, ≥99% recall at the 0.5
    * threshold and →1 above it) while verification stays EXACT
    * Jaccard over the shingle hashes, so emitted pairs carry true
    * scores and false candidates are discarded; the only deviation
    * from the exact path is banding recall on near-threshold pairs.
    * Below the threshold the exact join runs unchanged (the oracle
    * gates the exact path at sf0.01). */
  def ngramJaccardPairsAuto(df: DataFrame, idCol: String, textCol: String,
                            n: Int, threshold: Double,
                            maxShingleFreq: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    // MEASURED (round 13, sf10, 1M docs, quiet box): the banded route
    // ran 81-102s vs the exact join's 43-61s on the benchmark corpus —
    // its 32-minhash build outweighs the candidate-space saving when
    // duplicate multiplicity is low (1 partner/doc), and HIGH-
    // multiplicity clusters blow up BOTH generators (every cluster
    // member collides in every band). Default is therefore OFF
    // (threshold = Long.MaxValue); set graft.dedup.bandedAbove for
    // corpora where the shingle join's candidate space, not the pair
    // output, is the bottleneck (high shingle-df, low dup density).
    val bandedAbove = spark.conf.getOption("graft.dedup.bandedAbove")
      .flatMap(_.toLongOption).getOrElse(Long.MaxValue)
    // The count is a full corpus pass; with the knob unset the branch is
    // statically decidable (n <= MaxValue always), so don't buy a scan
    // to compute it — at 100 TB that count is an extra job per cascade.
    if (bandedAbove == Long.MaxValue || df.count() <= bandedAbove)
      ngramJaccardPairs(df, idCol, textCol, n, threshold, maxShingleFreq)
    else
      minhashLshPairs(df, idCol, textCol, n, numHashes = 32, bands = 16,
        threshold = threshold)
  }

  /** [[ngramJaccardPairs]] with an owned cache handle (see the class doc's
    * cache-lifecycle paragraph). */
  def ngramJaccardPairsScoped(df: DataFrame, idCol: String, textCol: String,
                              n: Int, threshold: Double,
                              maxShingleFreq: Int = 1000): CachedResult = {
    val ds = shingleHashes(df, idCol, textCol, n).cache()
    val sizes = ds.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    // skew cap as a broadcast anti-join on the hot-shingle list: the
    // list has at most |shingles|/cap entries by construction, and the
    // partial-aggregated groupBy ships only distinct shingle hashes per
    // task — unlike a count-over-window, which shuffles and sorts EVERY
    // (id, shingle) row into per-shingle partitions before filtering
    val hot = ds.groupBy(col("h")).agg(count(lit(1)).as("df_sh"))
      .filter(col("df_sh") > maxShingleFreq).select(col("h"))
    val capped = ds.join(broadcast(hot), Seq("h"), "left_anti")
    val pairs = capped.as("a")
      .join(capped.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    val verified = pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    new CachedResult(verified, Seq(ds))
  }

  /** Emit-once banding filter: given each side's full per-band signature
    * array and the current (0-based) band position, a pair is kept only if
    * NO earlier band already collided — so every colliding pair is emitted
    * exactly once, at its first colliding band, and the cross-band
    * `distinct()` (a full extra shuffle of up to `bands` copies of every
    * candidate pair) disappears into a join-side filter. */
  private[operators] def firstCollisionOnly(aArr: Column, bArr: Column,
                                            pos: Column): Column =
    !exists(zip_with(slice(aArr, lit(1), pos), slice(bArr, lit(1), pos),
      (x, y) => x === y), p => p)

  /** Distinct (id, 64-bit xxhash64 shingle hash) pairs. The hash runs
    * BEFORE the distinct, fused into the shingle-explode scan, so the
    * dedup exchange carries 8-byte longs instead of shingle strings
    * (guide §2.3) — set-equal to hashing [[docShingles]]' output: the
    * image of a set equals the image of the multiset, so per-doc hash
    * SETS are identical by construction, and only the derived COUNTS
    * (n_sh) could differ, under a per-doc 64-bit collision between
    * different shingles (2⁻⁶⁴ per pair; oracle-confirmed equal on the
    * gated corpora). */
  private def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(shingleHashArr(col(textCol), n, poly = false)).as("h"))
      .distinct()

  /** Distinct (id, portable [[polyHash]] shingle hash) pairs — the
    * store/sidecar flavor of [[shingleHashes]] (the sidecar protocol
    * and its DuckDB oracles replay polyHash, not xxhash64). Same
    * hash-before-distinct shape: ONE exchange of (id, long) replaces
    * the former two (distinct over (id, string), then distinct again
    * over (id, hash)); per-id hash sets are identical by construction. */
  private[operators] def shinglePolyHashes(df: DataFrame, idCol: String,
                                           textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(shingleHashArr(col(textCol), n, poly = true)).as("x"))
      .distinct()

  /** MinHash signature matrix via K universal-hash permutations
    * h_k(x) = (a_k * x + b_k) mod p computed columnar (no UDF), then
    * LSH banding: candidates collide in ≥1 band; exact Jaccard verifies.
    * Returns verified pairs (id_a, id_b, jaccard ≥ threshold). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5): DataFrame =
    minhashLshPairsScoped(df, idCol, textCol, n, numHashes, bands, threshold).df

  /** [[minhashLshPairs]] with an owned cache handle (see the class doc's
    * cache-lifecycle paragraph). */
  def minhashLshPairsScoped(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 5, numHashes: Int = 32, bands: Int = 8,
                            threshold: Double = 0.5): CachedResult = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // 31-bit lanes: products stay < 2^62, so the universal-hash arithmetic
    // never wraps and the min-hash collision property holds exactly
    val p = 2147483647L // 2^31 - 1 (Mersenne prime)
    val rnd = new scala.util.Random(42)
    val coefs = Seq.fill(numHashes)((rnd.nextInt((p - 1).toInt).toLong + 1,
                                     rnd.nextInt(p.toInt).toLong))
    // one shingle-hash relation shared by signature build AND verification
    // (recomputing it would redo the explode+distinct shuffle twice)
    val hashed = shingleHashes(df, idCol, textCol, n).cache()
    val x = pmod(col("h"), lit(p))
    // per-row signature array h_k(x) for all K permutations at once, folded
    // to the per-document element-wise minimum by ONE ArrayMinAgg aggregate
    // (instead of K separate min columns widening plan + agg buffer K-fold)
    val coefArr = typedlit(coefs)
    val sigRow = transform(coefArr,
      c => pmod(x * c.getField("_1") + c.getField("_2"), lit(p)))
    val sigAgg = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(
        graft.plans.ArrayMinAgg(GraftColumnBridge.expression(sigRow), numHashes)
          .toAggregateExpression())
    }
    val sigs = hashed.groupBy(col("id")).agg(sigAgg.as("sig"))
    // banding: one row per (id, band, band-signature), carrying the full
    // band-signature array so the join can emit each pair exactly once (at
    // its first colliding band) instead of deduplicating with a distinct;
    // hash inputs are the same minhash values as the per-column
    // formulation, so buckets (and therefore candidates) are unchanged
    val bandSigArr = array((0 until bands).map { bi =>
      hash((bi * rowsPerBand until (bi + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1)): _*)
    }: _*)
    val banded = sigs.select(col("id"), bandSigArr.as("sigs"))
      .select(col("id"), col("sigs"), posexplode(col("sigs")).as(Seq("band", "bsig")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.id") < col("b.id") &&
        firstCollisionOnly(col("a.sigs"), col("b.sigs"), col("a.band")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // exact verification of candidates only (reuses the cached relation);
    // the h column joins as an equi-key — an id-only join would explode
    // each pair into |shingles|² rows before filtering
    val ds = hashed
    val sizes = ds.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = candidates
      .join(ds.withColumnRenamed("id", "id_a"), "id_a")
      .join(ds.withColumnRenamed("id", "id_b"), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
    val verified = common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    new CachedResult(verified, Seq(hashed))
  }

  /** 64-bit SimHash over token hashes: sign of per-bit weighted sums.
    * Columnar construction WITHOUT the per-bit row explosion: each token
    * instance carries its full 64-element ±1 contribution vector, folded
    * to per-document sums by ONE element-wise [[graft.plans.ArraySumAgg]]
    * — the aggregate sees |instances| rows, not |instances|x64 (the
    * explode formulation was the measured dominator of the sf10 dedup
    * cascade: ~1.2e10 rows through the (id, bit) aggregate). Sums are
    * identical, so results are bit-equal to the explode form. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(TextOps.normalizeText(col(textCol)), " ")).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val contribRow = array((0 until 64).map { i =>
      when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)
    }: _*)
    signBitsToLong(sumContribs(toks, contribRow, 64), 64)
  }

  /** Per-doc contribution sums via one [[graft.plans.ArraySumAgg]]. */
  private def sumContribs(toks: DataFrame, contribRow: Column,
                          bits: Int): DataFrame = {
    val sumAgg = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(
        graft.plans.ArraySumAgg(GraftColumnBridge.expression(contribRow),
          bits).toAggregateExpression())
    }
    toks.groupBy(col("id")).agg(sumAgg.as("s"))
  }

  /** (id, s: array of per-bit sums) → (id, simhash): bit i set iff
    * s(i) > 0 — the same positive-sum rule as the explode formulation,
    * assembled by summing disjoint powers of two. */
  private def signBitsToLong(sums: DataFrame, bits: Int): DataFrame = {
    val pows = typedlit(Seq.tabulate(bits)(i => 1L << i))
    sums.select(col("id"),
      aggregate(
        zip_with(col("s"), pows,
          (v, pw) => when(v > 0, pw).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x).as("simhash"))
  }

  /** SimHash near-dup candidate pairs with Hamming distance ≤ maxDist,
    * banded on 4 × 16-bit chunks (pigeonhole: any pair within distance 3
    * agrees on ≥1 chunk). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame =
    simhashPairsScoped(df, idCol, textCol, maxDist).df

  /** [[simhashPairs]] with an owned cache handle (see the class doc's
    * cache-lifecycle paragraph). */
  def simhashPairsScoped(df: DataFrame, idCol: String, textCol: String,
                         maxDist: Int = 3): CachedResult =
    hammingPairs(simhash(df, idCol, textCol), chunkBits = 16, nChunks = 4,
      maxDist = maxDist)

  /** Banded Hamming near-dup pairs over ANY precomputed 64-bit signature
    * relation (id, simhash) — e.g. perceptual image hashes
    * ([[Multimodal.extractAHash]]) or externally computed SimHashes. The
    * 4×16-bit pigeonhole banding is exact for maxDist ≤ 3; output
    * (id_a, id_b, hamming). One-shot form; repeated callers use
    * [[hammingNearDupScoped]] and release the signature cache. */
  def hammingNearDup(sig: DataFrame, maxDist: Int = 3): DataFrame =
    hammingNearDupScoped(sig, maxDist).df

  /** [[hammingNearDup]] with an owned cache handle (see the class doc's
    * cache-lifecycle paragraph). */
  def hammingNearDupScoped(sig: DataFrame, maxDist: Int = 3): CachedResult =
    hammingPairs(sig, chunkBits = 16, nChunks = 4, maxDist = maxDist)

  /** Banded Hamming-distance pairs over a (id, simhash) relation: signatures
    * are split into `nChunks` chunks of `chunkBits` bits; by pigeonhole any
    * pair with Hamming distance < nChunks agrees on ≥1 chunk, so for
    * maxDist ≤ nChunks - 1 the banding is EXACT (100% recall) — the chunk
    * equi-join replaces the all-pairs product at scale. */
  private def hammingPairs(sig0: DataFrame, chunkBits: Int, nChunks: Int,
                           maxDist: Int): CachedResult = {
    require(maxDist < nChunks, "pigeonhole banding needs maxDist < nChunks")
    val sig = sig0.cache()
    val mask = (1L << chunkBits) - 1
    val chunkArr = array((0 until nChunks).map(c =>
      shiftright(col("simhash"), c * chunkBits).bitwiseAND(lit(mask))): _*)
    val chunks = sig.select(col("id"), col("simhash"), chunkArr.as("cks"))
      .select(col("id"), col("simhash"), col("cks"),
        posexplode(col("cks")).as(Seq("chunk", "ck")))
    val pairs = chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
        col("a.id") < col("b.id") &&
        firstCollisionOnly(col("a.cks"), col("b.cks"), col("a.chunk")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    new CachedResult(pairs, Seq(sig))
  }

  /** Portable 31-bit polynomial token hash: left fold over code points,
    * acc = (acc*31 + codepoint) mod (2^31 - 1). Unlike xxhash64 this is
    * expressible identically in any engine with a list fold (the DuckDB
    * oracle recomputes it verbatim), making simhash results cross-engine
    * verifiable. Products stay < 2^36 — no overflow under ANSI mode.
    * Native codegen'd ([[graft.plans.PolyHash]]). */
  def polyHash(t: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.PolyHash(GraftColumnBridge.expression(t)))
  }

  /** Oracle-checkable SimHash: 60-bit signature where bit i's per-token
    * contribution is the sign of a universal hash (a_i*h + b_i) mod p of the
    * portable [[polyHash]] — every step re-expressible in SQL, so a DuckDB
    * oracle can recompute signatures bit-exactly (unlike the xxhash64 fast
    * path in [[simhash]]). 60 bits = 4 × 15-bit pigeonhole chunks while
    * keeping every shift strictly below the sign bit in engines without
    * unsigned 64-bit ints. */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String,
                      bits: Int = 60, seed: Long = 42L): DataFrame = {
    val p = 2147483647L
    val coefs = simhashCoefs(bits, seed)
    val toks = df.select(col(idCol).as("id"),
        explode(split(TextOps.normalizeText(col(textCol)), " ")).as("t"))
      .withColumn("h", polyHash(col("t")))
    // one ±1 vector per token INSTANCE, summed by the element-wise
    // aggregate — no |instances|×bits explosion (see [[simhash]]'s
    // scaladoc for the measured sf10 rationale); sums, and therefore
    // signatures, are bit-equal to the explode formulation, so the
    // SQL oracle replay is unchanged
    val contribRow = array(coefs.map { case (a, b) =>
      when(pmod(col("h") * lit(a) + lit(b), lit(p)) < lit(p / 2), 1L)
        .otherwise(-1L)
    }: _*)
    signBitsToLong(sumContribs(toks, contribRow, bits), bits)
  }

  /** Universal-hash coefficients (a_i, b_i) for [[simhashPortable]] — also
    * consumed by the oracle-SQL generator so both engines share them. */
  def simhashCoefs(bits: Int, seed: Long): Seq[(Long, Long)] = {
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)((rnd.nextInt((p - 1).toInt).toLong + 1,
                    rnd.nextInt(p.toInt).toLong))
  }

  /** Portable-simhash near-dup pairs (Hamming ≤ maxDist over the 60-bit
    * signature), banded 4 × 15 bits — exact recall by pigeonhole. */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           maxDist: Int = 3): DataFrame =
    simhashPairsPortableScoped(df, idCol, textCol, maxDist).df

  /** [[simhashPairsPortable]] with an owned cache handle (see the class
    * doc's cache-lifecycle paragraph). */
  def simhashPairsPortableScoped(df: DataFrame, idCol: String, textCol: String,
                                 maxDist: Int = 3): CachedResult =
    hammingPairs(simhashPortable(df, idCol, textCol), chunkBits = 15,
      nChunks = 4, maxDist = maxDist)

  /** Resolve near-dup pairs into duplicate GROUPS — the step an actual
    * dedup pipeline runs after pair generation: connected components over
    * the undirected pair graph, labelling every document with the minimum
    * id reachable from it (the canonical representative to keep).
    *
    * Distributed min-label propagation: each iteration joins labels to
    * edges and takes the per-node neighborhood minimum (one shuffle per
    * iteration, converges in O(component diameter) rounds — near-dup
    * components are shallow, so a handful). Label relations are
    * `localCheckpoint`ed to cut lineage growth across iterations; the
    * driver sees only the one-row convergence check per round. This is
    * the standard large-graph CC shape (Pregel / hash-to-min) — no
    * union-find on the driver.
    *
    * @return (id, group_id, group_size, is_canonical) for EVERY corpus
    *         document; singletons form their own group.
    */
  /** Pick each dup group's surviving document by an arbitrary quality
    * criterion (longest text, highest quality score, …) instead of
    * [[dupGroups]]'s default lowest-id label: one window over the group —
    * ties broken by id so the choice is deterministic. Returns the
    * corpus rows that survive dedup. */
  def selectCanonical(corpus: DataFrame, idCol: String, groups: DataFrame,
                      preferBy: Column): DataFrame = {
    val w = Window.partitionBy(col("group_id"))
      .orderBy(preferBy.desc, col(idCol).asc)
    corpus.join(groups.select(col("id").as(idCol), col("group_id")), idCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "group_id")
  }

  /** Cross-document line-level deduplication (the CCNet/RefinedWeb
    * boilerplate-removal shape, re-derived): a line occurring in at least
    * `minDocs` DISTINCT documents is boilerplate (headers, cookie
    * banners, nav footers) and is dropped from EVERY document; surviving
    * lines are reassembled in their original order. Documents losing all
    * their lines stay in the output with empty text.
    *
    * Scale shape: one shuffle for the distinct-doc line count (partially
    * aggregated map-side), one anti-join of the line table against the
    * frequent-line relation (tiny by definition — boilerplate repeats —
    * so AQE broadcasts it), one regroup per document. No collects, no
    * per-document state.
    *
    * @return (idCol, textCol cleaned, n_lines_kept, n_lines_total)
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs >= 2 (a 1-threshold would drop every line)")
    val docs = df.select(col(idCol).as("id"), col(textCol).as("t"))
    val lines = docs.select(col("id"),
      posexplode(split(col("t"), "\n")).as(Seq("line_no", "line")))
    val frequent = lines.groupBy(col("line"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(frequent, Seq("line"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line")), "\n").as("kept_text"),
        count(lit(1)).as("n_lines_kept"))
    docs.join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("kept_text"), lit("")).as(textCol),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        size(split(col("t"), "\n")).cast("long").as("n_lines_total"))
  }

  def dupGroups(corpus: DataFrame, idCol: String, pairs: DataFrame,
                maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .cache()
    var labels = corpus.select(col(idCol).cast("long").as("id"))
      .distinct().withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val nbrMin = edges
        .join(labels.select(col("id").as("id_b"), col("label").as("nl")), "id_b")
        .groupBy(col("id_a").as("id")).agg(min(col("nl")).as("nmin"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("next"))
      // pointer jumping: follow next → label(next) so label chains halve
      // every round — convergence in O(log diameter) iterations instead of
      // O(diameter), which the fixed cap could not otherwise guarantee
      val fwd = propagated.select(col("id").as("jid"), col("next").as("jnext"))
      val updated = propagated
        .join(fwd, propagated("next") === fwd("jid"), "left")
        .select(col("id"), col("label"),
          least(col("next"), coalesce(col("jnext"), col("next"))).as("next"))
        .localCheckpoint(true)
      converged = updated.filter(col("next") < col("label")).isEmpty
      labels = updated.select(col("id"), col("next").as("label"))
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"dupGroups: min-label propagation did not converge in $maxIterations " +
        "iterations — raise maxIterations (components of diameter " +
        s"> 2^$maxIterations are implausible for dup graphs)")
    labels.select(col("id"), col("label").as("group_id"))
      .withColumn("group_size",
        count(lit(1)).over(Window.partitionBy(col("group_id"))))
      .withColumn("is_canonical", col("id") === col("group_id"))
  }

  /** Decision step of a dedup pipeline: per connected near-dup component
    * ([[dupGroups]] over `pairs`), KEEP the best-scoring member — highest
    * `scoreCol` (an exact integer score, e.g. the quality heuristic), ties
    * broken by lowest id — and report what the decision drops. One row per
    * group: (group_id, group_size, kept_id, kept_score, n_dropped).
    *
    * Scale shape: the score is a projection on the corpus scan, the group
    * labels come from O(log diameter) label propagation, and the pick is a
    * single map-side-combinable groupBy whose state is one struct per
    * group (`max(struct(score, -id))` — lexicographic struct max IS the
    * argmax with the tie-break, no window over the corpus). */
  def canonicalPick(corpus: DataFrame, idCol: String, pairs: DataFrame,
                    scoreCol: String): DataFrame = {
    val groups = dupGroups(corpus, idCol, pairs)
      .select(col("id"), col("group_id"))
    val scored = corpus.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("long").as("score"))
    groups.join(scored, "id")
      .groupBy(col("group_id"))
      .agg(
        count(lit(1)).cast("long").as("group_size"),
        max(struct(col("score"), (-col("id")).as("nid"))).as("best"))
      .select(col("group_id"),
        col("group_size"),
        (-col("best.nid")).as("kept_id"),
        col("best.score").as("kept_score"),
        (col("group_size") - 1).cast("long").as("n_dropped"))
  }

  /** Leakage-safe train/val/test split: assign the split by NEAR-DUP
    * GROUP, not by document — a per-doc hash split routinely places two
    * near-duplicates on opposite sides of the train/test fence, leaking
    * evaluation content into training. Group labels come from
    * [[dupGroups]]; the seeded hash split ([[Sampling.withSplit]]) is
    * applied to the group-id relation and every member inherits its
    * group's label, so no component can straddle splits by construction.
    * Returns (id, group_id, split).
    *
    * Scale shape: the split decision is a pure projection on the
    * distinct-group relation; the inherit step is one equi-join on
    * group_id (both sides already hash-partitioned by it from the
    * propagation). */
  def groupSafeSplit(corpus: DataFrame, idCol: String, pairs: DataFrame,
                     splits: Seq[(String, Double)],
                     seed: Long = 42L): DataFrame = {
    val groups = dupGroups(corpus, idCol, pairs)
      .select(col("id"), col("group_id"))
    val gsplit = Sampling.withSplit(
      groups.select(col("group_id")).distinct(), "group_id", splits, seed)
    groups.join(gsplit, "group_id")
      .select(col("id"), col("group_id"), col("split"))
  }

  /** Blocked fuzzy join: near-match pairs by edit distance, without the
    * all-pairs comparison. Rows are blocked on the first `blockLen`
    * characters of the whitespace-collapsed lowercase text — an
    * EQUI-join, so the O(n²) comparison collapses to per-block joins —
    * and candidates are verified with `levenshtein` over the first
    * `cmpLen` characters. The fuzzy-entity-matching staple: blocking
    * recall is explicit (pairs differing inside the block prefix are
    * missed — pick `blockLen` per domain), cost is Σ|block|², and a hot
    * block is ordinary join skew (AQE-splittable) rather than a plan
    * change.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                        blockLen: Int = 16, cmpLen: Int = 60,
                        maxDist: Int = 10): DataFrame = {
    val norm = lower(regexp_replace(trim(col(textCol)), "\\s+", " "))
    val t = df.select(col(idCol).as("id"),
      substring(norm, 1, blockLen).as("blk"), substring(norm, 1, cmpLen).as("cmp"))
    val a = t.select(col("id").as("a_id"), col("cmp").as("a_cmp"), col("blk"))
    val b = t.select(col("id").as("b_id"), col("cmp").as("b_cmp"), col("blk"))
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_cmp"), col("b_cmp")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Universal-hash coefficient pairs (a ∈ [1, p−1], b ∈ [0, p−1]) from a
    * seeded PRNG — interpolable into oracle SQL like [[simhashCoefs]]. */
  def minhashCoefs(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt((p - 1).toInt).toLong + 1,
                         rnd.nextInt(p.toInt).toLong))
  }

  /** Portable minhash signature store: one row per (doc, permutation k)
    * with the signature value min over shingles of (a_k·h + b_k) mod p,
    * where h is the SQL-replayable [[polyHash]] — so the signature
    * VALUES gate against a DuckDB oracle, not just the pair sets they
    * induce (q21). The relation is the persistent form of near-dup
    * state for incremental ingestion: signatures of two loads merge by
    * per-(doc, k) MIN, the same element-wise law [[graft.plans.ArrayMinAgg]]
    * applies inside one load — so a standing signature table is updated
    * by union + re-aggregate, never by re-reading old text. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 16,
                        seed: Long = 7L): DataFrame = {
    val p = 2147483647L
    val coefs = minhashCoefs(numHashes, seed)
    // NO distinct before the aggregate: min over the shingle multiset
    // equals min over its set, so deduplicating first would buy a full
    // (id, shingle) exchange for nothing (guide §2.4 — the per-(id, k)
    // MIN is already the partial-aggregated reduction); signature
    // values are bit-identical either way, which the per-value oracle
    // (q88) gates
    val hashed = df.select(col(idCol).as("id"),
        explode(shingleHashArr(col(textCol), n, poly = true)).as("x"))
    val coefArr = typedlit(coefs)
    val sigRow = transform(coefArr,
      c => pmod(col("x") * c.getField("_1") + c.getField("_2"), lit(p)))
    val sigAgg = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(
        graft.plans.ArrayMinAgg(GraftColumnBridge.expression(sigRow), numHashes)
          .toAggregateExpression())
    }
    hashed.groupBy(col("id")).agg(sigAgg.as("sig"))
      .select(col("id").as(idCol), posexplode(col("sig")).as(Seq("k", "mh")))
      .select(col(idCol), col("k").cast("long").as("k"), col("mh"))
  }

  /** PARTITIONED SIGNATURE STORE — the [[minhashSignatures]] relation
    * laid out for its two standing-corpus duties: absorbing loads via
    * the per-(doc, k) MIN merge law, and forgetting documents. The
    * layout keys on the DOCUMENT (`d_bucket = id mod buckets`, doc-and-
    * k-sorted files), because both duties are doc-footprint-bounded:
    * all of one document's K signature rows co-locate in one bucket, so
    * a merge touches only the delta's doc buckets and a forget's
    * buckets are DERIVED from the ids (no discovery scan at all). The
    * banded LSH join key, by contrast, spreads every doc across all
    * bands — an index derived at join time, not a storage layout.
    * Bucket count rides in a `meta` sidecar (same contract as the
    * embedding store's [[Similarity.writeStandingStore]]). */
  /** `$path/$dataDir` as a DataFrame under either commit protocol:
    * versioned stores ([[StoreSwap.isVersioned]]) resolve through the
    * latest committed manifest — an atomic SNAPSHOT, immune to
    * concurrent mutation — while legacy stores list the live dir.
    * Filters on `partCol` prune files in both modes (the partition
    * column infers from the dir names either way). */
  private def dirDf(spark: SparkSession, path: String, dataDir: String,
                    partCol: String): DataFrame =
    StoreSwap.readDir(spark, path, dataDir, partCol)

  /** Whether `dataDir` exists under either protocol — a committed
    * manifest (versioned) or a live directory (legacy). */
  private def dirExists(spark: SparkSession, path: String,
                        dataDir: String): Boolean =
    StoreSwap.dirExists(spark, path, dataDir)

  /** Full write of a store dataDir under the store's commit protocol
    * (writers auto-follow a versioned store; `forceVersioned` starts
    * one). */
  private def writeDir(spark: SparkSession, path: String, dataDir: String,
                       partCol: String, df: DataFrame, sortCols: Seq[Column],
                       forceVersioned: Boolean = false): Unit =
    StoreSwap.overwriteDir(spark, path, dataDir, partCol, df, sortCols,
      forceVersioned)

  /** @param versioned start the store on the versioned-manifest commit
    *                  protocol ([[StoreSwap]]'s snapshot mode): every
    *                  later mutation of data/bands/bands_inv/shingles
    *                  commits reader-atomically (a concurrent reader
    *                  sees the old or the new complete store, never a
    *                  missing bucket), at the cost of manifest
    *                  indirection on reads. Legacy (default) keeps the
    *                  in-place bucket swap, whose swap instant requires
    *                  a maintenance window for readers. */
  def writeSignatureStore(sigs: DataFrame, path: String, idCol: String,
                          buckets: Int = 64,
                          versioned: Boolean = false): Unit = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val spark = sigs.sparkSession
    writeDir(spark, path, "data", "d_bucket",
      sigs.withColumn("d_bucket",
        pmod(col(idCol), lit(buckets.toLong)).cast("int")),
      Seq(col(idCol), col("k")), forceVersioned = versioned)
    spark.range(1).select(lit(buckets).as("buckets"))
      .write.mode("overwrite").parquet(path + "/meta")
  }

  /** Absorb a load into the signature store via the q109 merge law,
    * executed BUCKET-LOCALLY: only the delta's doc buckets are read,
    * union-min-re-aggregated with the delta, and swapped in through
    * [[StoreSwap.stagedRewrite]] (staged to disk, manifest-committed,
    * crash rolled forward — a merge can never leave a bucket half
    * absorbed); untouched buckets' files never open. Because the store
    * co-locates each doc's rows, re-ingesting a document is idempotent
    * (identical signatures MIN to themselves) and a NEW doc's bucket
    * materializes on first touch. The merge shuffle is bounded by the
    * touched buckets' contents — delta-footprint, not corpus. Returns
    * the touched bucket ids. */
  def mergeIntoSignatureStore(spark: SparkSession, path: String,
                              delta: DataFrame, idCol: String): Seq[Int] = {
    val (standing, buckets) = readSignatureStore(spark, path)
    val withB = delta
      .withColumn("d_bucket",
        pmod(col(idCol), lit(buckets.toLong)).cast("int"))
    val touched = withB.select(col("d_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Seq.empty
    val standingSlice = standing
      .filter(col("d_bucket").isin(touched: _*))
    val merged = standingSlice.unionByName(withB)
      .groupBy(col("d_bucket"), col(idCol), col("k"))
      .agg(min(col("mh")).as("mh"))
    StoreSwap.stagedRewrite(spark, path, "d_bucket", touched, merged,
      Seq(col(idCol), col("k")))
    touched
  }

  /** EXACTLY-ONCE composed ingest of a delta batch into the signature
    * store and its serving structures — the foreachBatch body of a
    * streaming text-ingest loop (q212's flow), hardened for the
    * at-least-once redelivery contract. The three merges are each
    * idempotent for identical batch content (signatures MIN to
    * themselves, the shingle sidecar REPLACEs per doc, band rows
    * collapse in the distinct), so redelivery was already
    * content-harmless; what the ledger adds is the SKIP — an acked
    * batchId returns before `deltaDocs` is even evaluated, so a
    * redelivered batch costs one manifest read instead of three
    * store mutations. Ack ordering: merges first,
    * [[StoreSwap.ackBatch]] LAST — a crash between them re-runs the
    * idempotent merges on redelivery and THEN acks; a crash after the
    * ack skips outright. Requires the store's data dir on the
    * versioned protocol when `batchId` is used. */
  def ingestBatchIntoStore(spark: SparkSession, path: String,
                           deltaDocs: DataFrame, idCol: String,
                           textCol: String,
                           batchId: Option[Long] = None,
                           n: Int = 3, numHashes: Int = 16): Unit =
    StoreSwap.withLease(spark, path) {
    if (batchId.isDefined)
      require(StoreSwap.dataDirVersioned(spark, path, "data"),
        s"$path is not versioned: the batch ledger needs the manifest" +
          " commit protocol (writeSignatureStore with versioned = true)")
    if (batchId.exists(
        StoreSwap.committedBatches(spark, path, "data").contains))
      return // redelivered batch: already fully absorbed and acked
    def run(): Unit = {
      mergeIntoSignatureStore(spark, path,
        minhashSignatures(deltaDocs, idCol, textCol, n, numHashes), idCol)
      if (shingleSidecarExists(spark, path))
        mergeShinglesIntoStore(spark, path, deltaDocs, idCol, textCol)
      if (StoreSwap.dirExists(spark, path, "bands"))
        mergeIntoBandIndex(spark, path,
          deltaDocs.select(col(idCol)), idCol)
      batchId.foreach(StoreSwap.ackBatch(spark, path, "data", _))
    }
    // a UNIFIED store upgrades the composed flow from idempotence+
    // ack-last to a real transaction: the three merges AND the ledger
    // ack publish in ONE manifest rename — a crash anywhere inside
    // leaves the store at its pre-batch version with the batch
    // unacked, so redelivery re-runs from scratch against unchanged
    // state. Per-dataDir stores keep the ack-last protocol (each merge
    // commits separately; idempotence covers the gaps).
    if (StoreSwap.isUnified(spark, path))
      StoreSwap.transact(spark, path) { run() }
    else run()
  }

  /** Migrate a signature store (and every serving structure it
    * carries) to [[StoreSwap]]'s UNIFIED manifest: `data`, `bands`,
    * `bands_inv`, and `shingles` stop versioning independently and
    * every commit — including [[ingestBatchIntoStore]]'s composed
    * three-merge ingest, which becomes a single-rename transaction —
    * publishes one store-wide snapshot. Any retained version is then
    * a CONSISTENT state of the whole store, which is what makes
    * [[lshJudgeStoreAt]]'s historical judgment replay exact. */
  def unifySignatureStore(spark: SparkSession, path: String): Unit = {
    // seed the versioned layout record from the live sidecar INTO the
    // migration manifest: a band index built BEFORE migration thereby
    // gets its constants pinned at the cutover, so historical
    // judgments of the migration snapshot survive a later rebuild
    // under a different graft.lsh.bandIndexBuckets (bandsMetaAt would
    // otherwise have to fail fast on those versions)
    val bm = new org.apache.hadoop.fs.Path(path + "/bands_meta")
    val seed =
      if (bm.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(bm)) {
        val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
        val (b, r, ib) = bandsMeta(spark, path, buckets)
        bandsMetaEntries(b, r, ib)
      } else Map.empty[String, Seq[Long]]
    StoreSwap.unifyVersioning(spark, path,
      Seq("data", "bands", "bands_inv", "shingles"), seedMeta = seed)
  }

  /** The full signature store plus its recorded bucket count, with any
    * committed-but-unapplied bucket swap of a crashed mutation rolled
    * forward first ([[StoreSwap.recover]]). */
  def readSignatureStore(spark: SparkSession,
                         path: String): (DataFrame, Int) = {
    StoreSwap.recover(spark, path)
    val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
    (dirDf(spark, path, "data", "d_bucket"), buckets)
  }

  /** TIME-TRAVEL read of a VERSIONED signature store — the text twin
    * of [[Similarity.readStandingStoreAt]]: any retained manifest
    * version of the data resolves to a complete historical snapshot
    * (retention = `graft.store.snapshotKeep`). Band index, inventory,
    * and shingle sidecar version independently (own manifests per
    * dataDir), so a historical JUDGMENT replay should rebuild those
    * from the pinned signatures; this read serves the signature state
    * itself — audits, diffs, forget verification. Schema-equal to
    * [[readSignatureStore]]: the `d_bucket` partition column is kept
    * in both. */
  def readSignatureStoreAt(spark: SparkSession, path: String,
                           version: Int): (DataFrame, Int) = {
    val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
    (StoreSwap.readVersionedAt(spark, path, "data", "d_bucket", version),
      buckets)
  }

  /** Retained (readable) manifest versions of a versioned signature
    * store's data, ascending; last = live. */
  def signatureStoreVersions(spark: SparkSession, path: String): Seq[Int] =
    StoreSwap.snapshotVersions(spark, path, "data")

  /** MANIFEST-PRUNED CDC for the SIGNATURE store — the text twin of
    * [[Similarity.standingStoreDiff]]: a doc-level change feed between
    * two retained versions of `data`, where `change` is `insert` (doc
    * only in `toV`), `delete` (only in `fromV`), or `update` (present
    * in both with a DIFFERENT signature — what a re-ingest's MIN-merge
    * does to docs whose text gained shingles). The 100 TB property is
    * the same: generations are immutable once committed, so a d_bucket
    * whose generation list is IDENTICAL in both manifests is
    * byte-identical and is never opened — diff cost tracks the
    * mutation footprint between the versions, not the corpus. A
    * downstream replica (a mirrored band index, a dedup-aware search
    * tier) consumes this instead of rescanning 1e9 docs' signatures.
    * Returns (change, doc_id) with `idCol` as the doc id column. */
  def signatureStoreDiff(spark: SparkSession, path: String,
                         idCol: String, fromV: Int,
                         toV: Int): DataFrame = {
    val eA = StoreSwap.snapshotEntriesAt(spark, path, "data", fromV)
    val eB = StoreSwap.snapshotEntriesAt(spark, path, "data", toV)
    val changed = (eA.keySet ++ eB.keySet)
      .filter(d => eA.get(d) != eB.get(d))
      .map(_.stripPrefix("d_bucket=").toInt).toSeq.sorted
    if (changed.isEmpty)
      return spark.range(0).select(lit("").as("change"),
        lit(0L).as(idCol)).filter(lit(false))
    // per-doc signature VALUE over the changed buckets only: the
    // k-sorted (k, mh) collect is order-canonical, and the comparison
    // is on the full mh array — exact, no hash-collision bound (a
    // 31-bit fingerprint would silently drop ~2^-31 of real updates
    // from a feed a replica trusts). k longs per doc over the
    // mutation footprint is still delta-scale, not corpus-scale.
    def side(v: Int, as: String) =
      StoreSwap.readVersionedAt(spark, path, "data", "d_bucket", v,
          buckets = Some(changed))
        .groupBy(col(idCol))
        .agg(transform(array_sort(collect_list(struct(col("k"), col("mh")))),
          e => e.getField("mh")).as(as))
    side(fromV, "old_fp")
      .join(side(toV, "new_fp"), Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("old_fp").isNull, lit("insert"))
          .when(col("new_fp").isNull, lit("delete"))
          .when(col("old_fp") =!= col("new_fp"), lit("update")))
      .filter(col("change").isNotNull)
      .select(col("change"), col(idCol))
  }

  /** FORGET documents from the signature store — the text modality's
    * right-to-be-forgotten: the ids' buckets are DERIVED (id mod
    * buckets), only those are rewritten without the doomed docs' rows.
    * The rewrite is staged and manifest-committed
    * ([[StoreSwap.stagedRewrite]]), so a crash mid-forget can never
    * resurrect the forgotten signatures — including the fully-emptied-
    * bucket case, whose directory drop rides in the same commit. A
    * shingle sidecar, when present, drops the docs' rows in the same
    * mutation (its own staged swap — a crash between the two swaps
    * leaves the forget incomplete, and re-running it, the documented
    * recovery for every store mutation, completes idempotently; a
    * lingering sidecar row alone can never resurface a verdict, since
    * candidates come from the band index). One outer lease brackets
    * both swaps. Returns signature rows removed. */
  def forgetDocsFromSignatureStore(spark: SparkSession, path: String,
                                   docIds: DataFrame,
                                   idCol: String): Long =
    StoreSwap.withLeaseAtomic(spark, path) {
    val (standing, buckets) = readSignatureStore(spark, path)
    val ids = docIds.select(col(idCol)).distinct()
    val touched = ids
      .select(pmod(col(idCol), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return 0L
    val slice = standing
      .filter(col("d_bucket").isin(touched: _*))
    val kept = slice.join(ids, Seq(idCol), "left_anti")
    val before = slice.count()
    val removed = before - StoreSwap.stagedRewrite(spark, path, "d_bucket",
      touched, kept, Seq(col(idCol), col("k")))
    if (shingleSidecarExists(spark, path)) {
      val shKept = dirDf(spark, path, "shingles", "d_bucket")
        .filter(col("d_bucket").isin(touched: _*))
        .join(ids.select(col(idCol).as("id")), Seq("id"), "left_anti")
      StoreSwap.stagedRewrite(spark, path, "d_bucket", touched, shKept,
        Seq(col("id"), col("x")), "shingles")
    }
    removed
  }

  /** SHINGLE-HASH SIDECAR — the store artifact that makes near-dup
    * JUDGMENT doc-footprint end to end. The signature store holds
    * signatures (merge/forget) and band rows (candidate lookup), but
    * exact verification needs each candidate's distinct shingle-hash
    * set — and deriving that from corpus TEXT costs a corpus-footprint
    * scan per delta batch (the one remaining corpus-scale read of the
    * text lifecycle; sf1 evidence: q212 judge 2.6× for 10× standing).
    * This persists the per-doc distinct [[polyHash]](shingle) rows
    * (id, x) partitioned by the doc's own bucket (`d_bucket = id mod
    * buckets`, like `data` and `bands_inv`), so verification reads
    * ONLY candidate docs' buckets. Shingle width n rides in
    * `shingles_meta`; [[lshJudgeStore]] auto-uses the sidecar when
    * present and fails fast if a candidate doc is missing from it
    * (an incomplete sidecar must never silently drop verdicts).
    *
    * Content contract: the sidecar mirrors each doc's CURRENT text —
    * a re-ingest REPLACES its rows ([[mergeShinglesIntoStore]]),
    * matching what verification against caller-supplied text gives.
    * (The signature MIN-merge, by contrast, accumulates the union of
    * ingests — its stale candidates are exactly what verification
    * discards, and [[reindexDocsInBandIndex]] repairs.) */
  def writeShingleSidecar(spark: SparkSession, path: String,
                          docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3): Unit = StoreSwap.withLease(spark, path) {
    StoreSwap.recover(spark, path)
    val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
    writeDir(spark, path, "shingles", "d_bucket",
      shinglePolyHashes(docs, idCol, textCol, n)
        .withColumn("d_bucket",
          pmod(col("id"), lit(buckets.toLong)).cast("int")),
      Seq(col("id"), col("x")))
    spark.range(1).select(lit(n).as("n"))
      .write.mode("overwrite").parquet(path + "/shingles_meta")
  }

  /** Whether `path` carries the shingle-hash sidecar. */
  private[operators] def shingleSidecarExists(spark: SparkSession,
                                              path: String): Boolean =
    dirExists(spark, path, "shingles")

  /** Absorb a delta load into the shingle sidecar — REPLACE semantics
    * per doc (the sidecar mirrors current text; see
    * [[writeShingleSidecar]]'s content contract): the delta ids'
    * buckets are DERIVED (id mod buckets), their old rows anti-joined
    * out, the fresh distinct shingle hashes merged in, all through the
    * crash-atomic staged swap. Runs with the signature merge in the
    * ingest flow: merge signatures, merge shingles, merge band index.
    * Returns touched buckets. */
  def mergeShinglesIntoStore(spark: SparkSession, path: String,
                             deltaDocs: DataFrame, idCol: String,
                             textCol: String): Seq[Int] =
    StoreSwap.withLease(spark, path) {
    StoreSwap.recover(spark, path)
    require(shingleSidecarExists(spark, path),
      s"$path has no shingle sidecar — build it with writeShingleSidecar")
    val n = spark.read.parquet(path + "/shingles_meta").head.getInt(0)
    val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
    val ids = deltaDocs.select(col(idCol).as("id")).distinct()
    val touched = ids
      .select(pmod(col("id"), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Seq.empty
    val fresh = shinglePolyHashes(deltaDocs, idCol, textCol, n)
      .withColumn("d_bucket", pmod(col("id"), lit(buckets.toLong)).cast("int"))
    val kept = dirDf(spark, path, "shingles", "d_bucket")
      .filter(col("d_bucket").isin(touched: _*))
      .join(ids, Seq("id"), "left_anti")
      .select(col("id"), col("x"), col("d_bucket"))
    StoreSwap.stagedRewrite(spark, path, "d_bucket", touched,
      kept.unionByName(fresh), Seq(col("id"), col("x")), "shingles")
    touched
  }

  /** Replayable per-band signatures over a k-sorted signature array:
    * band b's value is a polynomial fold (seed b, multiplier 1000003,
    * mod p) over its rowsPerBand signature values in k order — the same
    * collision-grouping role as a murmur band hash, but exactly
    * re-expressible in SQL (`list_reduce`), so the BANDING itself can
    * be oracle-replayed: a gate over the band index asserts the exact
    * candidate set, with no recall assumption hiding behind a
    * non-replayable hash. Fold values stay < 2^51 (acc < 2^31,
    * multiplier < 2^20) — no wrap on either engine. */
  private def bandSigArray(sig: Column, bands: Int,
                           rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      aggregate(slice(sig, b * rowsPerBand + 1, rowsPerBand),
        lit(b.toLong),
        (acc, x) => pmod(acc * lit(1000003L) + x, lit(2147483647L)))
    }: _*)

  /** (id, band, bsig, bb_bucket) band rows for a signature relation
    * (idCol, k, mh). */
  private def bandRows(sigs: DataFrame, idCol: String, bands: Int,
                       rowsPerBand: Int, buckets: Int): DataFrame =
    sigs.groupBy(col(idCol).as("id"))
      .agg(transform(array_sort(collect_list(struct(col("k"), col("mh")))),
        e => e.getField("mh")).as("sig"))
      .select(col("id"),
        posexplode(bandSigArray(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "bsig")))
      .withColumn("bb_bucket",
        pmod(col("bsig"), lit(buckets.toLong)).cast("int"))

  /** BAND INDEX over the signature store — the lookup-side projection
    * the doc-bucketed layout cannot provide: [[writeSignatureStore]]
    * co-locates a DOC's rows (merge and forget are doc-footprint
    * bounded), but an incremental near-dup judgment needs the standing
    * corpus keyed by BAND COLLISION, or every delta batch rescans all
    * signatures. This derives (id, band, bsig) rows from the store and
    * partitions them by `bb_bucket = bsig mod buckets`: a delta's band
    * values prune the index read to min(|delta bands|, buckets)
    * directories — the text twin of the embedding store's probe-pruned
    * search. Bands/rowsPerBand ride in a `bands_meta` sidecar. */
  def writeBandIndex(spark: SparkSession, path: String, idCol: String,
                     bands: Int = 8): Unit =
    StoreSwap.withLeaseAtomic(spark, path) {
    val (sigs, buckets) = readSignatureStore(spark, path)
    // one aggregation pass serves both constants: the hash count and
    // the standing doc count the layout auto-selection needs
    val aggRow = sigs.agg(max(col("k")).as("mk"),
      count(lit(1)).as("n")).head
    val numHashes = aggRow.getLong(0).toInt + 1
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val r = numHashes / bands
    // INDEX-DIRECTORY GRANULARITY — the layout lever for the judge's
    // past-PushdownCap growth term: with `graft.lsh.bandIndexBuckets`
    // unset the index shares the store's bucket count (64 dirs — a
    // mid-size delta's ~4000 distinct bsigs touch every dir, so past
    // the literal-pushdown cap the slice scan is unpruned). A FINER
    // bsig partitioning (e.g. 4096 dirs) lets the touched-dir list
    // itself prune: a delta touches ~min(|delta bsigs|, dirs) dirs, so
    // directory pruning carries weight exactly where the literal list
    // no longer fits. MEASURED AND REJECTED as the default (round 14,
    // BandLayoutProbe, quiet box, 50k→500k standing): 4096 dirs lost
    // ~2× absolute at every tier — judge 500-doc 12.1→14.3 s vs
    // 4.6→7.0 s at 64 dirs, 5000-doc 15.6→17.2 vs 7.0→8.7 s, index
    // build 28.6-29.7 vs 4.1-6.0 s (4096 tiny files per generation).
    // The hypothesis direction was RIGHT — per-10×-standing flatness
    // improved to 1.18×/1.10× (500/5000-doc) vs 1.51×/1.25× — but the
    // listing + small-file constant dominates until per-dir row mass
    // amortizes it (~3 more decades of standing, ≥500M docs). Since
    // round 15 the default is AUTO-SELECTED from the standing doc
    // count at the measured crossover ([[autoBandIndexBuckets]]): the
    // store bucket count below it (= r14's measured best at 50k/500k),
    // scaling as docs/125k past ≥500M docs per the recorded break-even.
    // The manual knob stays as override. Recorded in bands_meta (and,
    // on unified stores, the pinned manifest) so every later mutation/
    // judgment derives the same layout.
    val nDocs = aggRow.getLong(1) / numHashes // one row per (doc, k)
    val idxBuckets = spark.conf.getOption("graft.lsh.bandIndexBuckets")
      .flatMap(_.toIntOption).filter(_ >= 1)
      .getOrElse(autoBandIndexBuckets(buckets, nDocs))
    writeDir(spark, path, "bands", "bb_bucket",
      bandRows(sigs.select(col(idCol), col("k"), col("mh")),
        idCol, bands, r, idxBuckets),
      Seq(col("band"), col("bsig"), col("id")))
    // per-doc BAND INVENTORY, partitioned by the doc's OWN bucket: the
    // index rows a doc currently owns stay DERIVABLE FROM ITS ID even
    // after a re-ingest changes its signature (the band values — hence
    // the index buckets — of the old rows are otherwise unrecoverable).
    // This is what makes [[reindexDocsInBandIndex]] doc-footprint
    // instead of the full rebuild that used to be the only stale-row
    // remedy. Derived from the JUST-WRITTEN index (a cheap column scan)
    // rather than re-running the corpus-scale band derivation a second
    // time — the rebuild's dominant compute would otherwise double.
    writeDir(spark, path, "bands_inv", "d_bucket",
      dirDf(spark, path, "bands", "bb_bucket")
        .select(col("id"), col("band"), col("bsig"), col("bb_bucket"))
        .withColumn("d_bucket",
          pmod(col("id"), lit(buckets.toLong)).cast("int")),
      Seq(col("id"), col("band")))
    spark.range(1).select(lit(bands).as("bands"),
        lit(r).as("rows_per_band"), lit(idxBuckets).as("idx_buckets"))
      .write.mode("overwrite").parquet(path + "/bands_meta")
    // On unified stores the layout constants ALSO version through the
    // manifest (same rename as the band rows, via withLeaseAtomic): a
    // historical judgment resolves bands/r/idx_buckets from its pinned
    // version, so a rebuild under a different graft.lsh.bandIndexBuckets
    // inside the retention window can never make a replay compute delta
    // bb_buckets under the NEW layout against band rows written under
    // the OLD one (which silently drops candidates).
    if (StoreSwap.isUnified(spark, path))
      putBandsMeta(spark, path, bands, r, idxBuckets)
  }

  /** AUTO band-index directory granularity from the standing doc
    * count — the pure rule derived from BandLayoutProbe's measured
    * crossover (round 14, quiet box): finer layouts improve
    * per-decade flatness (1.18× vs 1.51× at 4096 dirs) but lose ~2×
    * ABSOLUTE until per-dir row mass amortizes the dir-listing +
    * small-file constant, which the probe places at ≥500M docs for
    * 4096 dirs — i.e. ~125k docs per directory. Below the crossover
    * the store's own bucket count is the measured best (50k and 500k
    * tiers both); past it, directories scale as docs/125k (next power
    * of two, capped at 65536 to bound per-generation file count). */
  private[graft] def autoBandIndexBuckets(storeBuckets: Int,
                                          nDocs: Long): Int = {
    val perDir = 125000L // docs per dir at the measured break-even
    val wanted = nDocs / perDir
    if (wanted <= storeBuckets) storeBuckets
    else math.min(65536L, java.lang.Long.highestOneBit(wanted - 1) * 2)
      .toInt
  }

  /** Manifest-metadata names under which the band-index layout
    * constants version — ONE name per constant (manifest values
    * serialize as sorted sets, so an ordered tuple can't ride in a
    * single entry). */
  private val BandsKey = "bands.b"
  private val RowsPerBandKey = "bands.r"
  private val IdxBucketsKey = "bands.idx"

  private def bandsMetaEntries(bands: Int, r: Int,
                               idxBuckets: Int): Map[String, Seq[Long]] =
    Map(BandsKey -> Seq(bands.toLong), RowsPerBandKey -> Seq(r.toLong),
      IdxBucketsKey -> Seq(idxBuckets.toLong))

  private def putBandsMeta(spark: SparkSession, path: String,
                           bands: Int, r: Int, idxBuckets: Int): Unit =
    StoreSwap.putStoreMeta(spark, path,
      bandsMetaEntries(bands, r, idxBuckets))

  /** Whether `path` carries the per-doc band inventory (indexes built
    * before it existed lack one until the next [[writeBandIndex]]). */
  private def bandInvExists(spark: SparkSession, path: String): Boolean =
    dirExists(spark, path, "bands_inv")

  /** The inventory's rows for `docIds` — doc-bucket pruned. */
  private def invRowsForDocs(spark: SparkSession, path: String,
                             docIds: DataFrame, idCol: String,
                             buckets: Int): DataFrame = {
    val ids = docIds.select(col(idCol).as("id")).distinct()
    val db = ids
      .select(pmod(col("id"), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    dirDf(spark, path, "bands_inv", "d_bucket")
      .filter(col("d_bucket").isin(db: _*))
      .join(ids, Seq("id"), "left_semi")
      .select(col("id"), col("band"), col("bsig"), col("bb_bucket"))
  }

  /** (bands, rowsPerBand, idxBuckets) — idxBuckets falls back to the
    * store's bucket count for indexes written before the layout knob
    * existed (their bands_meta has two columns). */
  private def bandsMeta(spark: SparkSession, path: String,
                        storeBuckets: Int): (Int, Int, Int) = {
    val df = spark.read.parquet(path + "/bands_meta")
    val m = df.head
    val idx = if (df.columns.contains("idx_buckets"))
      m.getAs[Int]("idx_buckets") else storeBuckets
    (m.getInt(0), m.getInt(1), idx)
  }

  /** The layout constants a reader at `asOf` must derive band rows
    * with. Live reads use the `bands_meta` sidecar; PINNED reads
    * resolve from the pinned manifest ([[StoreSwap.storeMetaAt]]) —
    * a [[writeBandIndex]] rebuild under a different
    * `graft.lsh.bandIndexBuckets` inside the retention window rewrites
    * the live sidecar, and deriving delta `bb_bucket`s from it against
    * band rows PINNED under the old layout silently drops candidates.
    * A pinned manifest that predates the first recorded layout falls
    * back to the live sidecar only when NO retained manifest carries a
    * record (index never rebuilt since the recording began — live
    * still describes the pinned rows); otherwise it fails fast. */
  private def bandsMetaAt(spark: SparkSession, path: String,
                          storeBuckets: Int,
                          asOf: Option[Int]): (Int, Int, Int) =
    asOf match {
      case Some(v) =>
        (StoreSwap.storeMetaAt(spark, path, BandsKey, Some(v)),
         StoreSwap.storeMetaAt(spark, path, RowsPerBandKey, Some(v)),
         StoreSwap.storeMetaAt(spark, path, IdxBucketsKey, Some(v))) match {
          case (Some(Seq(b)), Some(Seq(r)), Some(Seq(ib))) =>
            (b.toInt, r.toInt, ib.toInt)
          case _ =>
            require(!StoreSwap.storeMetaRecordedEver(spark, path,
                BandsKey),
              s"$path: the band index was rebuilt AFTER version $v (a" +
                " later retained manifest records layout constants this" +
                " one lacks) - the live bands_meta may not describe the" +
                " pinned band rows, so this replay would silently drop" +
                " candidates. Re-pin at a post-rebuild version or" +
                " restore the pre-rebuild index from archive")
            bandsMeta(spark, path, storeBuckets)
        }
      case None => bandsMeta(spark, path, storeBuckets)
    }

  /** Current doc-pruned band rows for `docIds` — reads the docs'
    * POST-merge signatures through the store's doc-bucket pruning. */
  private def bandRowsForDocs(spark: SparkSession, path: String,
                              docIds: DataFrame,
                              idCol: String): DataFrame = {
    val (sigs, buckets) = readSignatureStore(spark, path)
    val (bands, r, idxBuckets) = bandsMeta(spark, path, buckets)
    val ids = docIds.select(col(idCol)).distinct()
    val db = ids
      .select(pmod(col(idCol), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val docSigs = sigs.filter(col("d_bucket").isin(db: _*))
      .join(ids, Seq(idCol), "left_semi")
      .select(col(idCol), col("k"), col("mh"))
    bandRows(docSigs, idCol, bands, r, idxBuckets)
  }

  /** Absorb docs into the band index AFTER their
    * [[mergeIntoSignatureStore]]: their current (post-MIN-merge) band
    * rows are union-distinct-merged into the touched `bb_bucket`s via
    * the crash-atomic staged swap. Re-ingesting identical text is
    * idempotent (identical rows collapse in the distinct). A re-ingest
    * that CHANGED a doc's signature leaves its old band rows stale —
    * stale rows cost false candidates that the judge's exact
    * verification discards, never wrong results — and the band
    * inventory records them, so [[reindexDocsInBandIndex]] clears them
    * doc-footprint (no [[writeBandIndex]] rebuild needed). Returns
    * touched buckets. */
  def mergeIntoBandIndex(spark: SparkSession, path: String,
                         docIds: DataFrame,
                         idCol: String): Seq[Int] = StoreSwap.withLeaseAtomic(
      spark, path) {
    val rows = bandRowsForDocs(spark, path, docIds, idCol)
      .localCheckpoint(true) // |docs|·bands rows, referenced twice
    val touched = rows.select(col("bb_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Seq.empty
    val slice = dirDf(spark, path, "bands", "bb_bucket")
      .filter(col("bb_bucket").isin(touched: _*))
    val merged = slice.select(col("id"), col("band"), col("bsig"),
        col("bb_bucket"))
      .unionByName(rows).distinct()
    StoreSwap.stagedRewrite(spark, path, "bb_bucket", touched, merged,
      Seq(col("band"), col("bsig"), col("id")), "bands")
    // inventory upkeep: after the merge the docs own old ∪ fresh rows
    // in the index — record exactly that, so a later repair or forget
    // can find the old rows without a corpus scan. Index swap FIRST:
    // a crash here leaves the inventory missing the fresh rows, and
    // re-running the merge (the documented recovery for every store
    // mutation) completes it idempotently.
    if (bandInvExists(spark, path)) {
      val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
      val ids = docIds.select(col(idCol).as("id")).distinct()
      val db = ids
        .select(pmod(col("id"), lit(buckets.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      val invSlice = dirDf(spark, path, "bands_inv", "d_bucket")
        .filter(col("d_bucket").isin(db: _*))
        .select(col("id"), col("band"), col("bsig"), col("bb_bucket"))
      val invMerged = invSlice.unionByName(rows).distinct()
        .withColumn("d_bucket",
          pmod(col("id"), lit(buckets.toLong)).cast("int"))
      StoreSwap.stagedRewrite(spark, path, "d_bucket", db, invMerged,
        Seq(col("id"), col("band")), "bands_inv")
    }
    touched
  }

  /** Drop docs from the band index. With the band inventory present,
    * the docs' rows (INCLUDING stale ones from signature-changing
    * re-ingests) are found through their own d_buckets; a pre-inventory
    * index falls back to deriving from the docs' current signatures, in
    * which case this MUST run BEFORE [[forgetDocsFromSignatureStore]]
    * (the signature forget destroys the derivation) and stale rows from
    * changed signatures are missed. Returns rows removed. */
  def forgetFromBandIndex(spark: SparkSession, path: String,
                          docIds: DataFrame,
                          idCol: String): Long = StoreSwap.withLeaseAtomic(
      spark, path) {
    StoreSwap.recover(spark, path)
    val hasInv = bandInvExists(spark, path)
    val rows =
      if (hasInv) {
        val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
        invRowsForDocs(spark, path, docIds, idCol, buckets)
      } else bandRowsForDocs(spark, path, docIds, idCol)
    val touched = rows.select(col("bb_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return 0L
    val ids = docIds.select(col(idCol).as("id")).distinct()
    val slice = dirDf(spark, path, "bands", "bb_bucket")
      .filter(col("bb_bucket").isin(touched: _*))
    val kept = slice.join(ids, Seq("id"), "left_anti")
    val before = slice.count()
    val removed = before - StoreSwap.stagedRewrite(spark, path,
      "bb_bucket", touched, kept,
      Seq(col("band"), col("bsig"), col("id")), "bands")
    // drop the docs' inventory rows too (index swap first — a crash
    // between the swaps re-runs to a no-op index rewrite, then
    // completes the inventory)
    if (hasInv) {
      val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
      val db = ids
        .select(pmod(col("id"), lit(buckets.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (db.nonEmpty) {
        val invKept = dirDf(spark, path, "bands_inv", "d_bucket")
          .filter(col("d_bucket").isin(db: _*))
          .join(ids, Seq("id"), "left_anti")
        StoreSwap.stagedRewrite(spark, path, "d_bucket", db, invKept,
          Seq(col("id"), col("band")), "bands_inv")
      }
    }
    removed
  }

  /** TARGETED REPAIR for docs whose signature changed since their last
    * index merge — the operation that retires the full
    * [[writeBandIndex]] rebuild as the only stale-row remedy (on a
    * 100 TB store the rebuild was the one corpus-scale op in an
    * otherwise delta-footprint lifecycle). The docs' OLD rows come from
    * the band inventory (their own d_buckets — no scan); rows the
    * current signatures no longer produce are anti-joined OUT of their
    * index buckets, the fresh rows are union-merged in, and the
    * inventory is reset to exactly the fresh rows. Index swap FIRST,
    * inventory second: a crash between the swaps re-runs with
    * `stale` already absent — the repair is idempotent. Cost tracks
    * the docs' band footprint (old ∪ new buckets), never the corpus.
    * Returns the number of stale rows removed. */
  def reindexDocsInBandIndex(spark: SparkSession, path: String,
                             docIds: DataFrame,
                             idCol: String): Long = StoreSwap.withLeaseAtomic(
      spark, path) {
    StoreSwap.recover(spark, path)
    require(bandInvExists(spark, path),
      s"$path has no band inventory — rebuild with writeBandIndex first")
    val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
    val fresh = bandRowsForDocs(spark, path, docIds, idCol)
      .localCheckpoint(true) // |docs|·bands rows, referenced three times
    val stale = invRowsForDocs(spark, path, docIds, idCol, buckets)
      .join(fresh.select(col("id"), col("band"), col("bsig")),
        Seq("id", "band", "bsig"), "left_anti")
      .localCheckpoint(true)
    val touched = stale.select(col("bb_bucket"))
      .unionByName(fresh.select(col("bb_bucket")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return 0L
    val nStale = stale.count()
    val slice = dirDf(spark, path, "bands", "bb_bucket")
      .filter(col("bb_bucket").isin(touched: _*))
    val kept = slice
      .join(stale.select(col("id"), col("band"), col("bsig")),
        Seq("id", "band", "bsig"), "left_anti")
    val merged = kept.select(col("id"), col("band"), col("bsig"),
        col("bb_bucket"))
      .unionByName(fresh).distinct()
    StoreSwap.stagedRewrite(spark, path, "bb_bucket", touched, merged,
      Seq(col("band"), col("bsig"), col("id")), "bands")
    // inventory := exactly the fresh rows for these docs
    val ids = docIds.select(col(idCol).as("id")).distinct()
    val db = ids
      .select(pmod(col("id"), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    val invKept = dirDf(spark, path, "bands_inv", "d_bucket")
      .filter(col("d_bucket").isin(db: _*))
      .select(col("id"), col("band"), col("bsig"), col("bb_bucket"))
      .join(ids, Seq("id"), "left_anti")
    val invNew = invKept.unionByName(fresh)
      .withColumn("d_bucket",
        pmod(col("id"), lit(buckets.toLong)).cast("int"))
    StoreSwap.stagedRewrite(spark, path, "d_bucket", db, invNew,
      Seq(col("id"), col("band")), "bands_inv")
    nStale
  }

  /** Judge a delta batch against the standing corpus THROUGH the band
    * index — the text twin of the embedding store's
    * `semDedupIncrementalStore`: the delta's signatures are computed
    * fresh (same portable arithmetic the store was built with), its
    * band values prune the index read to their `bb_bucket`s, candidates
    * are the (standing, delta) pairs colliding in ≥1 band, and only
    * candidates pay exact verification — distinct-shingle-hash Jaccard,
    * engine-exact at the [[polyHash]] level so the oracle replays
    * signatures, banding, candidates, AND the verdicts.
    *
    * Standing-side verification reads: with the shingle sidecar present
    * ([[writeShingleSidecar]]), the candidate docs' hash sets come from
    * their OWN `d_bucket` dirs — per batch the standing side costs a
    * band-pruned index read plus a doc-bucket-pruned sidecar read,
    * never a corpus rescan, and `standingDocs` is ignored (pass the
    * corpus relation for sidecar-less stores only, where verification
    * falls back to deriving shingles from its text — a corpus-footprint
    * scan per batch). A candidate doc absent from the sidecar fails
    * fast rather than silently dropping its verdicts.
    * Returns (id_a = standing, id_b = delta, jaccard ≥ threshold). */
  def lshJudgeStore(spark: SparkSession, path: String,
                    standingDocs: DataFrame, delta: DataFrame,
                    idCol: String, textCol: String, n: Int = 3,
                    numHashes: Int = 16, seed: Long = 7L,
                    threshold: Double = 0.5,
                    asOf: Option[Int] = None): DataFrame = {
    require(asOf.isEmpty || StoreSwap.isUnified(spark, path),
      s"$path: historical judgment (asOf) needs the UNIFIED manifest -" +
        " per-dataDir versions pin signatures only (bands and sidecar" +
        " version independently); migrate with unifySignatureStore")
    // a judgment-only process must also roll forward a crashed index
    // mutation's committed swap, or it serves stale band rows
    StoreSwap.recover(spark, path)
    val buckets = spark.read.parquet(path + "/meta").head.getInt(0)
    // layout constants resolve from the PINNED manifest on historical
    // replays (a post-pin rebuild may have changed them); live from the
    // bands_meta sidecar
    val (bands, r, idxBuckets) = bandsMetaAt(spark, path, buckets, asOf)
    require(bands * r == numHashes, "band geometry must match the store")
    // version-pinned store reads for the historical replay (meta stays
    // live - store bucket count fixed at build time)
    def storeDir(dataDir: String, partCol: String): DataFrame = asOf match {
      case Some(v) =>
        StoreSwap.readVersionedAt(spark, path, dataDir, partCol, v)
      case None => dirDf(spark, path, dataDir, partCol)
    }
    val sidecarPresent = asOf match {
      case Some(v) =>
        StoreSwap.snapshotEntriesAt(spark, path, "shingles", v).nonEmpty
      case None => shingleSidecarExists(spark, path)
    }
    if (asOf.isDefined) require(sidecarPresent,
      s"$path has no shingle sidecar at version ${asOf.get} - historical" +
        " judgment has no text fallback (the corpus text of that moment" +
        " is gone); only sidecar-carrying versions replay")
    if (sidecarPresent) {
      val sn = spark.read.parquet(path + "/shingles_meta").head.getInt(0)
      require(sn == n,
        s"shingle width n=$n must match the sidecar's (n=$sn)")
    }
    // DELTA-SIDE RELATIONS, computed ONCE for every chunk: the
    // signatures/band rows and the distinct shingle hashes are the
    // delta's whole footprint - materializing them here means a chunk
    // costs only its own store reads and joins, not a re-derivation of
    // the delta (the round-13 probe measured per-chunk re-derivation at
    // ~4 s fixed cost x chunk count before this hoist)
    val dSigs = minhashSignatures(delta, idCol, textCol, n, numHashes, seed)
    val dRowsAll = bandRows(dSigs, idCol, bands, r, idxBuckets)
      .select(col("id").as("d_id"), col("band"), col("bsig"),
        col("bb_bucket"))
      .localCheckpoint(true) // bounded: |delta| x bands rows
    val dShAll = shinglePolyHashes(delta, idCol, textCol, n)
      .withColumnRenamed("id", "d_id")
      .localCheckpoint(true) // bounded: the delta's distinct shingles
    // sidecar-less fallback: the standing corpus' shingle hashes,
    // derived from text - corpus-footprint, shared by every chunk (lazy;
    // each chunk semi-joins its own candidates against it)
    lazy val standingSh = shinglePolyHashes(standingDocs, idCol, textCol, n)
      .withColumnRenamed("id", "s_id")
    // DELTA-BATCH CHUNKING, the text twin of the PQ search's: the
    // delta's band rows are the broadcast side of the candidate join,
    // so an unbounded batch (1M docs x bands rows) would blow the
    // broadcast budget. Judgments are per-delta-doc independent, so
    // hash-chunking the delta and unioning the per-chunk results is
    // exact; each chunk executes eagerly (one broadcast alive at a
    // time) and prunes its own index buckets. Budget from
    // `graft.lsh.maxBroadcastMb` (default 64) at ~112 bytes per band
    // row.
    val targetBytes = math.max(1.0, spark.conf
      .getOption("graft.lsh.maxBroadcastMb")
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .getOrElse(64.0) * 1024 * 1024)
    val nDelta = dRowsAll.select(col("d_id")).distinct().count()
    val bcChunks = math.max(1L,
      math.ceil(nDelta.toDouble * bands * 112L / targetBytes).toLong).toInt
    // PUSHDOWN-SIZED sub-chunking, the second chunking driver: each
    // chunk's band-signature list (<= chunkDocs x bands values) and
    // candidate-id list only reach the parquet readers while they fit
    // [[PushdownCap]] - past it the scans fall back to the unpruned
    // band-index slice. MEASURED AND REJECTED as the default
    // (round 13, BandIndexProbe at 500k docs, quiet box, delta
    // relations hoisted): 500-doc deltas 18.8s in 4 pushdown chunks vs
    // 8.3s unchunked; 5000-doc deltas 95s in 40 chunks vs 8.1s
    // unchunked - per-chunk fixed cost (store listings, candidate
    // collects, verify joins) dwarfs the page-skip win, and the
    // unpruned slice scan AMORTIZES: flatness per 10x standing is
    // 1.14x at 100 docs (pushdown engaged, single chunk), 1.60x at
    // 500 (the worst point - scan not yet amortized), and 1.19x at
    // 5000 (amortized). `graft.lsh.maxJudgeChunks` (default 1 =
    // pushdown sizing off) keeps the lever for deployments where a
    // chunk's fixed cost is cheaper than an index-slice exchange;
    // the broadcast budget below still chunks huge batches.
    val maxJudgeChunks = spark.conf.getOption("graft.lsh.maxJudgeChunks")
      .flatMap(_.toIntOption).getOrElse(1)
    val pdChunks = math.ceil(nDelta.toDouble * bands / PushdownCap).toInt
    val chunks =
      if (pdChunks > bcChunks && pdChunks <= maxJudgeChunks) pdChunks
      else bcChunks
    def slice(dRows: DataFrame, dSh: DataFrame): DataFrame =
      lshJudgeSlice(spark, path, dRows, dSh, standingSh, sidecarPresent,
        buckets, threshold, storeDir)
    if (chunks == 1) slice(dRowsAll, dShAll)
    else
      (0 until chunks).map { i =>
        val in = pmod(xxhash64(col("d_id")), lit(chunks.toLong)) === i
        slice(dRowsAll.filter(in), dShAll.filter(in))
          .localCheckpoint(true) // run now; free this chunk's broadcast
      }.reduce(_ unionByName _)
  }

  /** HISTORICAL JUDGMENT REPLAY: judge `delta` against the store AS OF
    * retained unified version `version` - the band index AND the
    * shingle sidecar resolve from the SAME pinned manifest, so the
    * verdicts are bit-exactly what [[lshJudgeStore]] returned when
    * that version was live (the consistency the unified manifest
    * exists for; per-dataDir versioning cannot offer this - its
    * time-travel pins signatures only). Audits, incident replay,
    * "what would yesterday's corpus have said about this batch". */
  def lshJudgeStoreAt(spark: SparkSession, path: String,
                      delta: DataFrame, idCol: String, textCol: String,
                      version: Int, n: Int = 3, numHashes: Int = 16,
                      seed: Long = 7L,
                      threshold: Double = 0.5): DataFrame =
    lshJudgeStore(spark, path,
      standingDocs = delta.limit(0), // sidecar is required at the pinned
                                     // version; no text fallback
      delta, idCol, textCol, n, numHashes, seed, threshold,
      asOf = Some(version))

  /** One bounded-broadcast slice of the store judgment, over the
    * PRE-COMPUTED delta relations (band rows + distinct shingle
    * hashes) - a chunk pays only its own store reads and joins. */
  private def lshJudgeSlice(spark: SparkSession, path: String,
                            dRows: DataFrame, dSh: DataFrame,
                            standingSh: => DataFrame,
                            sidecarPresent: Boolean, buckets: Int,
                            threshold: Double,
                            storeDir: (String, String) => DataFrame): DataFrame = {
    val touched = dRows.select(col("bb_bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // same two pruning rungs as the sidecar read below: bucket dirs
    // always, plus the delta's band-signature list pushed into the
    // scan when it fits [[PushdownCap]] - the index files are
    // (band, bsig)-sorted within each bucket, so page stats skip
    // non-colliding rows instead of scanning the full standing index.
    // Beyond the cap (a 4000-value OR chain overflowed the parquet
    // evaluator's stack; splitting per band into 8 unioned scans paid
    // more in scan setup than it pruned) the single unpruned scan
    // stands for THIS chunk - the caller sizes chunks to the cap
    // (pdChunks) so mid-size deltas never get here; only batches past
    // graft.lsh.maxJudgeChunks amortize the unpruned scan instead.
    val idx0 = storeDir("bands", "bb_bucket")
      .filter(col("bb_bucket").isin(touched: _*))
    val dSigVals = dRows.select(col("bsig")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val idx = if (dSigVals.length <= PushdownCap)
      idx0.filter(col("bsig").isin(dSigVals: _*)) else idx0
    val cand = idx.join(broadcast(dRows), Seq("band", "bsig"))
      .filter(col("id") =!= col("d_id"))
      .select(col("id").as("s_id"), col("d_id")).distinct()
      .localCheckpoint(true) // candidate pairs - read 3-4x below
    // exact verification at the polyHash level (oracle-exact even under
    // 31-bit hash collisions - both engines count the same x values)
    val sIds = cand.select(col("s_id")).distinct()
      .localCheckpoint(true) // candidate DOCS - bounded, read 2-3x below
    val sSh = if (sidecarPresent) {
      // DOC-FOOTPRINT verification: candidate docs' hash sets from their
      // own sidecar buckets - the standing corpus text never opens
      val db = sIds
        .select(pmod(col("s_id"), lit(buckets.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      // two pruning rungs: directory-level (the candidates' d_buckets)
      // always; and - when the candidate set is bounded - the ids
      // PUSHED DOWN into the parquet scan itself, where the id-sorted
      // files' page stats skip non-candidate pages (dir pruning alone
      // goes blind once candidates outnumber buckets, and a broadcast
      // semi-join filters rows only AFTER they are read). The literal
      // id list is bounded by [[PushdownCap]] (the parquet OR-chain
      // depth limit - see the index read above); beyond it the
      // semi-join path keeps correctness and the bucket count carries
      // the pruning. Sessions must raise
      // spark.sql.parquet.pushdown.inFilterThreshold (default 10) to
      // the cap so the IN list actually reaches the parquet reader as
      // OR-of-equals rather than a min/max range.
      val ids = sIds.limit(PushdownCap + 1)
        .collect().map(_.getLong(0)).toSeq
      val base = storeDir("shingles", "d_bucket")
        .filter(col("d_bucket").isin(db: _*))
      val rows = (if (ids.length <= PushdownCap)
        base.filter(col("id").isin(ids: _*))
      else base.join(sIds.withColumnRenamed("s_id", "id"),
        Seq("id"), "left_semi"))
        .select(col("id").as("s_id"), col("x"))
      // an incomplete sidecar must fail, not silently drop verdicts
      // (the inner join on per-doc sizes would). Candidate-bounded job.
      val nMissing = sIds
        .join(rows.select(col("s_id")).distinct(), Seq("s_id"), "left_anti")
        .count()
      if (nMissing > 0) sys.error(
        s"$nMissing candidate doc(s) have no shingle sidecar rows under" +
          s" $path/shingles - the sidecar is incomplete; merge the" +
          " missing docs with mergeShinglesIntoStore (or rebuild with" +
          " writeShingleSidecar) before judging")
      rows
    } else standingSh.join(sIds, Seq("s_id"), "left_semi")
    val sizesD = dSh.groupBy(col("d_id")).agg(count(lit(1)).as("n_d"))
    val sizesS = sSh.groupBy(col("s_id")).agg(count(lit(1)).as("n_s"))
    cand.join(sSh, "s_id").join(dSh, Seq("d_id", "x"))
      .groupBy(col("s_id"), col("d_id")).agg(count(lit(1)).as("common"))
      .join(sizesS, "s_id").join(sizesD, "d_id")
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_s") + col("n_d") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("s_id").as("id_a"), col("d_id").as("id_b"),
        col("jaccard"))
  }

  /** Incremental-ingest novelty scoring: measure each newly arrived
    * document of `batch` against the already-ingested `corpus` — the
    * continuous-refresh twin of the whole-corpus dedup family. The
    * reference's equivalent is delete-before-insert reprocessing of a
    * redo file (/root/reference/Wrap.pm:146-177); a training-data
    * pipeline instead asks "is this document, or how much of it, already
    * in the corpus?" before admitting it.
    *
    * Two signals per batch doc, both equi-join shapes that scale out:
    *   - `exact_dup`: the document's normalized-text fingerprint exists
    *     in the corpus (hash semi-join — batch side is the small side of
    *     a broadcast when batches are bounded);
    *   - line-level novelty: the fraction of the doc's DISTINCT lines
    *     not present anywhere in the corpus (line-hash semi-join on
    *     md5, the [[lineDedup]] relation reused cross-corpus).
    *
    * Every batch row is scored: a NULL-text doc (explode of a null split
    * yields no line rows) still survives the LEFT join to its line stats
    * with n_lines = n_seen = 0. Note an empty-string doc is NOT the same
    * case — `split("", "\n")` yields `[""]`, so it scores n_lines = 1.
    *
    * @return (idCol, exact_dup, n_lines, n_seen, novelty) — novelty is
    *         (n_lines − n_seen) / n_lines; null when n_lines = 0
    *         (NULL-text docs, where no line evidence exists).
    */
  def noveltyScore(corpus: DataFrame, batch: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val corpusFps = corpus
      .select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()
    val corpusLines = corpus
      .select(explode(split(col(textCol), "\n")).as("line"))
      .select(md5(col("line")).as("lh")).distinct()
    val batchLines = batch
      .select(col(idCol).as("id"), explode(split(col(textCol), "\n")).as("line"))
      .select(col("id"), md5(col("line")).as("lh")).distinct()
    val lineStats = batchLines
      .join(corpusLines.withColumn("seen", lit(1)), Seq("lh"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        count(col("seen")).as("n_seen"))
    batch.select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
      .join(corpusFps.withColumn("dup", lit(1)), Seq("fp"), "left")
      .join(lineStats, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("dup").isNotNull.as("exact_dup"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        when(coalesce(col("n_lines"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise((col("n_lines") - col("n_seen")).cast("double") / col("n_lines"))
          .as("novelty"))
  }
}
