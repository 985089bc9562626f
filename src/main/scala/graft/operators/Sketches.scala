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

  /** HLL-style register sketch per group: 64 registers (Knuth-hash top 6
    * bits pick the register, the low 26 bits' leading-zero count + 1 is
    * the rank), mergeable by per-register MAX across loads — the
    * fixed-memory distinct sketch that, unlike KMV (q76), merges without
    * re-sorting and costs 64 bytes per group forever.
    *
    * Everything downstream of the hash is INTEGER: the rank comes from a
    * 26-branch comparison ladder (no float log2 — its rounding at powers
    * of two would be engine-dependent), and the harmonic denominator
    * Σ 2^(−M_j) is carried as the exact integer Σ 2^(27−M_j) over 2^27
    * (absent registers contribute the full 2^27), so the only float op
    * is the final α·m²·2^27 / denom divide — identical IEEE expression
    * both engines. Caveat: the multiplicative Knuth hash leaves lattice
    * structure in its LOW bits, so a densely CONSECUTIVE key range
    * biases the rank field and the estimate runs high (~1.7× measured
    * on 0..1899); random or naturally sparse key spaces estimate within
    * the ~13% standard error (SignalsSpec law). The replay contract is
    * unaffected — both engines compute the identical biased value.
    * Raw HLL estimate only (no linear-counting fallback:
    * it needs `ln`, which is libm-dependent — the gate reports the
    * zero-register count so a reader can see when the correction would
    * have applied).
    *
    * @return per group: (groupCols*, n_registers_set, hll_num — the
    *         exact integer denominator numerator, hll_est) */
  def hllSketch(df: DataFrame, groupCols: Seq[String],
                keyCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, keyCol), groupCols)

  /** The register relation (groupCols*, j, mj) — the sketch's STORED
    * form. Two loads' registers merge by `groupBy(group, j).max(mj)`
    * (see the SignalsSpec merge law); 64 rows per group forever. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
                   keyCol: String): DataFrame = {
    val (j, rho) = hllColumns(col(keyCol))
    df.select(groupCols.map(col) :+ j.as("j") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "j").map(col): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** The (register index, rank) projection for one key — shared by the
    * batch registers and the STREAMING maintenance path (q162), whose
    * keyed `max` state grows monotonically and absorbs redelivery for
    * free. */
  def hllColumns(key: Column): (Column, Column) = {
    val h = Layout.knuthHash(key) // 32-bit, shared replay form
    val j = (h / lit(1L << 26)).cast("long")      // top 6 bits: register
    val r = pmod(h, lit(1L << 26))                // low 26 bits: rank field
    var rho: Column = lit(27L)                    // r == 0 -> all zeros
    for (k <- 0 to 25)
      rho = when(r >= lit(1L << k), lit((26 - k).toLong)).otherwise(rho)
    (j, rho)
  }

  /** Fold a register relation into the estimate row per group. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_registers_set"),
        sum(call_function("shiftleft", lit(1L),
          (lit(27L) - col("mj")).cast("int"))).cast("long").as("s"))
      .withColumn("hll_num",
        col("s") + (lit(64L) - col("n_registers_set")) * lit(1L << 27))
      .withColumn("hll_est",
        lit(0.709) * lit(4096.0) * lit(134217728.0)
          / col("hll_num").cast("double"))
      .drop("s")

  /** The 26-branch rank ladder as oracle SQL over column `r` — generated
    * from the same loop as the engine expression. */
  def hllRhoSql(r: String): String =
    (25 to 0 by -1).map(k => s"WHEN $r >= ${1L << k} THEN ${26 - k}")
      .mkString("CASE ", " ", " ELSE 27 END")

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
