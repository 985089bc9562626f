package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership sketches for corpus-scale decontamination.
  *
  * The exact shingle equi-join (q53 / [[graft.operators.PipelineQueries.q53Decontam]])
  * shuffles BOTH sides on the shingle. At 100 TB the corpus side dominates
  * that shuffle; when the benchmark side is the small one (the usual case:
  * eval suites vs a web corpus), a Bloom filter of the benchmark n-grams
  * turns decontamination into a corpus-local scan — the only shuffles left
  * are the benchmark-side bitmap build (bounded by the filter size, not
  * the corpus) and the final per-document regroup. This is the same
  * shape Spark's own runtime-filter injection uses for join pruning.
  *
  * Everything is deterministic integer arithmetic over the portable
  * [[Dedup.polyHash]] — seeded double hashing to `numHashes` bit
  * positions — so an external engine can replay the exact bit set and the
  * exact (false-positive-inclusive) membership verdicts.
  */
object Bloom {

  /** Seeded universal-hash bit positions of a 31-bit gram hash:
    * pos_i = ((h·a_i + b_i) mod p) mod numBits, coefficients from
    * [[Sampling.coef]](seed + i) — shared with oracle SQL generators. */
  def positions(h: Column, numBits: Int, numHashes: Int, seed: Long): Seq[Column] =
    (0 until numHashes).map { i =>
      val (a, b) = Sampling.coef(seed + i)
      pmod(pmod(h * lit(a) + lit(b), lit(Sampling.P)), lit(numBits.toLong))
    }

  /** Build the bitmap as ONE `array<long>` row with built-in aggregates
    * only: explode bit positions → per-word `bit_or` (partially
    * aggregated map-side, so the shuffle is bounded by the number of
    * distinct words ≤ numBits/64, not by the gram count) → assemble the
    * dense word array on the single result row.
    *
    * Dense assembly is sort-based, NOT map-based: a zero row per word
    * index is unioned in below the single `bit_or` aggregation (the
    * identity, so the set bits are unchanged) and the final row sorts
    * the now-complete (w, word) pairs. The previous
    * `transform(sequence(0, nWords-1), wi -> m[wi])` probed a Catalyst
    * map literal whose `GetMapValue` is a LINEAR scan per lookup —
    * O(nWords²) on one core for the one result row, measured 21.6 s of
    * q66's 27.5 s prepare at 2^20 bits (BloomBuildProbe stage D vs C). */
  def buildBitmap(grams: DataFrame, gramCol: String, numBits: Int,
                  numHashes: Int, seed: Long): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
    val nWords = numBits / 64
    val pos = positions(Dedup.polyHash(col(gramCol)), numBits, numHashes, seed)
    val words = grams
      .select(explode(array(pos: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("b"))
      .unionByName(grams.sparkSession.range(nWords)
        .select(col("id").cast("int").as("w"), lit(0L).as("b")))
      .groupBy(col("w")).agg(bit_or(col("b")).as("word"))
    words
      .agg(array_sort(collect_list(struct(col("w"), col("word")))).as("s"))
      .select(transform(col("s"), e => e.getField("word")).as("bloom"))
  }

  /** Per-KEY bitmaps — one Bloom filter per shard/partition, the data-
    * skipping index a 100 TB table consults to decide which shards can
    * contain a key before reading any of them. Same bounded shape as
    * [[buildBitmap]] (per-(key, word) `bit_or`, partially aggregated
    * map-side), returning (keyCol, bloom: array<long>) — n_keys rows of
    * numBits/64 longs each, broadcastable model state. */
  def buildBitmaps(grams: DataFrame, keyCol: String, gramCol: String,
                   numBits: Int, numHashes: Int, seed: Long): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
    val nWords = numBits / 64
    val pos = positions(Dedup.polyHash(col(gramCol)), numBits, numHashes, seed)
    grams
      .select(col(keyCol).as("__k"), explode(array(pos: _*)).as("pos"))
      .select(col("__k"), (col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("b"))
      .groupBy(col("__k"), col("w")).agg(bit_or(col("b")).as("word"))
      .groupBy(col("__k"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("word"))).as("m"))
      .select(col("__k").as(keyCol),
        transform(sequence(lit(0), lit(nWords - 1)),
          wi => coalesce(col("m")(wi), lit(0L))).as("bloom"))
  }

  /** Membership probe against a bitmap column: all `numHashes` bits set.
    * Pure built-in integer ops (array get / shift / mask), whole-stage
    * codegen'd — no per-row driver state. */
  def mightContain(bloom: Column, h: Column, numBits: Int,
                   numHashes: Int, seed: Long): Column =
    positions(h, numBits, numHashes, seed).map { p =>
      (call_function("shiftright",
        get(bloom, (p / 64).cast("int")),
        (p % 64).cast("int")) bitwiseAND lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Flag corpus documents sharing n-gram shingles with a benchmark set,
    * Bloom-side: per document, the number of distinct shingles whose
    * `numHashes` filter bits are all set (false positives included — the
    * filter's own semantics, replayed exactly by the oracle) and the
    * `minHits` contamination verdict.
    *
    * @return (idCol, n_grams, n_flagged, contaminated)
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    shingleN: Int, numBits: Int, numHashes: Int,
                    minHits: Int, seed: Long): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingles(col(benchTextCol), shingleN)).as("sh"))
      .filter(length(col("sh")) > 0)
    // Materialize the bitmap ONCE and embed it as a literal array — the
    // same shape Spark's runtime-filter injection plans (BloomFilter
    // aggregate as a scalar subquery whose result feeds the probe). The
    // driver fetch is bounded by numBits/64 longs (128 KB at 2^20 bits),
    // exactly the bytes a broadcast would ship; joining the one-row
    // bitmap relation instead attaches the whole word array to EVERY
    // gram row's projection (measured 23.7 s → ~1 s at sf0.1).
    val bloomWords: Array[Long] = buildBitmap(bench, "sh", numBits, numHashes, seed)
      .collect()(0).getSeq[Long](0).toArray
    val bloom = typedLit(bloomWords)
    val grams = corpus
      .select(col(idCol).as("id"),
        explode(Dedup.shingles(col(textCol), shingleN)).as("sh"))
      .filter(length(col("sh")) > 0)
    // ONE corpus-side shuffle, keyed by document: the probe is a per-row
    // expression before the aggregation, and distinct-gram counting rides
    // the same grouped aggregate (hit is a function of the gram, so
    // distinct-hit-grams ≡ distinct grams that hit). The distinct rides
    // a 64-bit gram hash so the exchange carries longs, never the gram
    // strings (guide §2.3) — counts equal the string counts unless two
    // different grams of one doc collide in 2⁶⁴ (oracle-confirmed equal)
    grams
      .withColumn("hit",
        mightContain(bloom, Dedup.polyHash(col("sh")), numBits, numHashes, seed))
      .select(col("id"), xxhash64(col("sh")).as("g"), col("hit"))
      .groupBy(col("id"))
      .agg(countDistinct(col("g")).cast("long").as("n_grams"),
        countDistinct(when(col("hit"), col("g"))).cast("long").as("n_flagged"))
      .select(col("id").as(idCol), col("n_grams"), col("n_flagged"),
        (col("n_flagged") >= minHits).as("contaminated"))
  }
}
