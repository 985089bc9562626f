package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a bounded relation — the frequency twin of the KMV
  * distinct sketch ([[graft.plans.BoundedMinKAgg]], q76) and the histogram
  * quantile sketch ([[OrderStats.histQuantiles]], q78).
  *
  * The reference engine has no sketching at all (aggregation is delegated
  * to the DBMS, /root/reference/Wrap/DB.pm:71-99); at 100 TB a "top users
  * by frequency" question cannot afford an exact groupBy over every key,
  * so the engine carries a mergeable depth×width counter table instead:
  *
  *   - build: one map-side-combinable groupBy over (depth, bucket) — the
  *     output is bounded by depth·width rows regardless of input size or
  *     key skew, and two sketches built on different loads merge by
  *     summing counters (union + re-groupBy), so it is storable and
  *     incrementally maintainable like the reference's persistent DB
  *     state;
  *   - probe: estimate(key) = min over rows of counter(depth,
  *     h_depth(key)) — a broadcast join of the tiny sketch against the
  *     probe keys.
  *
  * Hashes are universal `((a·k + b) mod p) mod width` with fixed prime
  * coefficients, chosen (like q76's Knuth hash) to be exactly expressible
  * in ANSI SQL so a DuckDB oracle replays the sketch bit-for-bit:
  * a·k ≤ 86028121 · (p−1) < 2^63 never overflows a BIGINT in either
  * engine.
  */
object Sketches {

  /** Mersenne prime 2^31 − 1; the universal-hash modulus. */
  val P: Long = 2147483647L

  /** Fixed per-depth (a, b) coefficient pairs — primes, embedded as
    * literals in both the Spark plan and the oracle SQL. */
  val cmsCoefs: Seq[(Long, Long)] = Seq(
    (1299721L, 104729L),
    (15485863L, 32452843L),
    (49979687L, 67867967L),
    (86028121L, 93871949L))

  /** h_depth(key) = ((a·(key mod p) + b) mod p) mod width. */
  def cmsBucket(key: Column, depth: Int, width: Int): Column = {
    val (a, b) = cmsCoefs(depth)
    pmod(pmod(pmod(key, lit(P)) * lit(a) + lit(b), lit(P)), lit(width))
  }

  /** Build the sketch relation (depth, bucket, cnt) for a long-typed key
    * column. Output size is bounded by depth·width rows; the groupBy
    * partially aggregates map-side, so the shuffle moves at most
    * depth·width rows per task no matter how hot any key is. */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && depth <= cmsCoefs.size, s"depth 1..${cmsCoefs.size}")
    val depths = array((0 until depth).map(lit): _*)
    df.select(explode(depths).as("depth"), col(keyCol).as("k"))
      .select(col("depth"),
        // per-depth bucket chosen by the exploded depth index
        (0 until depth).foldLeft(lit(-1L)) { (acc, d) =>
          when(col("depth") === d, cmsBucket(col("k"), d, width)).otherwise(acc)
        }.as("bucket"))
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate frequencies for `probes` (must carry `keyCol`):
    * est(key) = min over depths of the key's counter. The sketch side is
    * depth·width rows — always broadcast. Estimates are upper bounds of
    * the true count (never under). A probe key with an empty
    * (depth, bucket) counter — possible when the sketch was built from a
    * stream that never touched that bucket — correctly estimates 0: the
    * join is a LEFT join with absent counters coalesced to 0, so every
    * probe row survives and an unseen key reports `cms_est = 0` instead
    * of vanishing or inheriting a colliding depth's count. */
  def cmsEstimate(probes: DataFrame, sketch: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probeBuckets = probes
      .select(col("*"), explode(array((0 until depth).map(lit): _*)).as("depth"))
      .withColumn("bucket",
        (0 until depth).foldLeft(lit(-1L)) { (acc, d) =>
          when(col("depth") === d, cmsBucket(col(keyCol), d, width)).otherwise(acc)
        })
    val others = probes.columns.filterNot(_ == keyCol).map(c => first(col(c)).as(c))
    probeBuckets
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col(keyCol))
      .agg(min(col("cnt")).as("cms_est"), others: _*)
  }
}
