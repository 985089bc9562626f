package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data curation. `df.sample()` is
  * partition-dependent (resampling under repartitioning / retries), which
  * is unacceptable for dataset reproducibility — these operators hash the
  * KEY instead: the same row lands in the same sample/split on any
  * cluster layout, any engine (the universal-hash arithmetic is plain
  * integer math, recomputable in SQL for verification).
  *
  *  - [[bernoulli]]: keep a fraction, decided per key.
  *  - [[stratifiedQuota]]: exactly-k-per-stratum (hash-ordered), the
  *    balanced-quota shape of corpus curation (k docs per language /
  *    domain). One shuffle on the stratum.
  *  - [[withSplit]]: stable train/val/test assignment by key — rows never
  *    migrate between splits when the corpus grows. To keep near-duplicate
  *    documents in the SAME split (no leakage across train/test), key the
  *    split on the dup-group label instead of the doc id: `withSplit(df
  *    joined with Dedup.dupGroups, "group_id", …)`.
  */
object Sampling {

  val P = 2147483647L // 2^31 - 1

  /** Seeded universal-hash coefficients (a, b) — also consumed by oracle
    * SQL generators. */
  def coef(seed: Long): (Long, Long) = {
    val rnd = new scala.util.Random(seed)
    (rnd.nextInt((P - 1).toInt).toLong + 1, rnd.nextInt(P.toInt).toLong)
  }

  /** h(key) = (a·key + b) mod p over the non-negative residue of the key.
    * The key must already be integral — for strings use [[keyHashFor]],
    * which routes through the portable polynomial hash first. */
  def keyHash(key: Column, seed: Long): Column = {
    val (a, b) = coef(seed)
    pmod(pmod(key.cast("long"), lit(P)) * lit(a) + lit(b), lit(P))
  }

  /** Schema-aware key hash: numeric keys feed [[keyHash]] directly,
    * string keys are pre-hashed with [[Dedup.polyHash]] (a bare
    * `cast("long")` on a string id yields null for every non-numeric
    * value, silently dropping all rows from [[bernoulli]] and routing
    * every row to the last [[withSplit]] label). Anything else is
    * rejected loudly. */
  def keyHashFor(df: DataFrame, idCol: String, seed: Long): Column = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    df.schema(idCol).dataType match {
      case _: NumericType => keyHash(col(idCol), seed)
      case StringType     => keyHash(Dedup.polyHash(col(idCol)), seed)
      case other => throw new IllegalArgumentException(
        s"Sampling key '$idCol' must be numeric or string, got $other")
    }
  }

  /** Keep ~`fraction` of rows, decided by key hash — reproducible under
    * any partitioning; pure filter, no shuffle. */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
                seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(keyHashFor(df, idCol, seed) < lit((fraction * P).toLong))
  }

  /** Exactly min(k, |stratum|) rows per stratum, chosen by hash order
    * (deterministic tiebreak on the key): balanced quota sampling.
    * Adds `sample_rank` (1-based within stratum). */
  def stratifiedQuota(df: DataFrame, strataCol: String, idCol: String,
                      k: Int, seed: Long = 42L): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(keyHashFor(df, idCol, seed), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Stable named splits by cumulative weight thresholds on the key hash
    * (e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)). Adds
    * `split`. Thresholds are computed once in integer space so engines
    * agree exactly. */
  def withSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val thresholds = splitThresholds(splits)
    val h = keyHashFor(df, idCol, seed)
    val expr = thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, upper), rest) => when(h < lit(upper), lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** (name, exclusive upper hash bound) per split; the last split takes
    * the remainder. Shared with oracle generators. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.map(_._1).zip(cum.map(c => (c * P).toLong))
  }
}
