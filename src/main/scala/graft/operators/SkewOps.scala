package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys (SURVEY.md "Optimize for scale"):
  * salting splits each hot key into `saltFactor` sub-keys — the left side
  * gets a random-but-deterministic salt, the right side is replicated once
  * per salt value — so a single executor no longer receives an entire hot
  * key's partition. AQE's skew-join handles moderate skew at runtime; the
  * explicit salt is for the pathological keys AQE can't split (e.g. one key
  * = 30% of a 100 TB fact table).
  */
object SkewOps {

  /** Inner equi-join with a salted key. Results are identical to
    * `left.join(right, keys)` — only the physical distribution changes.
    * The salt is derived from stable row content (hash of all left
    * columns), not rand(), so retries/speculative tasks agree. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val joined = salted.join(replicated, keys :+ "__salt")
    joined.drop("__salt")
  }

  /** Top-N heavy keys of a column — the diagnosis step before salting;
    * one partial-aggregated pass. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topN)
}
