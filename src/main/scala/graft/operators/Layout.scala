package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * A table range-partitioned and sorted by ONE column gives tight
  * per-file min/max stats — and therefore scan pruning — on that column
  * only; a predicate on any other column reads every file. Interleaving
  * the bits of several columns into one z-value and clustering by it
  * keeps per-file ranges narrow on ALL participating columns at once, so
  * at 100 TB a `WHERE custkey = … AND orderdate BETWEEN …` scan prunes
  * most files from the parquet footers alone — no data read, no shuffle.
  *
  * The z-value is a pure bit-arithmetic Column expression (32 shift/mask
  * terms for two 16-bit columns): whole-stage-codegen'd, exactly
  * replayable in ANSI SQL (the q79 oracle), and usable with any writer —
  * `repartitionByRange(zv).sortWithinPartitions(zv)` then write.
  */
object Layout {

  /** Morton z-value of `cols`, each clamped to `[0, 2^bits)` — callers
    * pre-scale values into that domain (e.g. `unix_date` for dates, a
    * modulus for ids). Bit i of column c lands at position
    * `i * cols.size + c`, so `cols.size * bits` must fit a long. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits > 0 && cols.size * bits <= 63,
      s"need 0 < cols*bits <= 63, got ${cols.size} cols x $bits bits")
    val lim = lit((1L << bits) - 1)
    val clamped = cols.map(c => least(greatest(c.cast("long"), lit(0L)), lim))
    val terms = for {
      (c, ci) <- clamped.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * cols.size + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered along the z-curve of `zCols`: range-partition
    * on the z-value (one file per contiguous curve segment), sort within
    * partitions, drop the helper column. `numFiles` bounds file count —
    * at cluster scale, size it so files land near the rowgroup target. */
  def storeZOrdered(df: DataFrame, path: String, zCols: Seq[Column],
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Knuth multiplicative hash mod 2^32 — shared with the q76/q77 gates;
    * exactly expressible in ANSI SQL. The key is reduced mod 2^31−1
    * before the multiply so the product stays < 2^63 in both engines
    * (keys ≥ ~3.47e9 would otherwise wrap Spark's Long while the
    * oracle's BIGINT raises). */
  def knuthHash(key: Column): Column =
    pmod(pmod(key, lit(2147483647L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic training-shard assignment + manifest: each row lands
    * in shard `knuthHash(id) mod nShards` (a hash-stable global shuffle —
    * re-running over a grown corpus moves no previously assigned doc),
    * and the manifest aggregates per shard what a training loader needs
    * to plan reads: row/char/token totals, language spread, and the
    * hash-order first/last doc ids (the shard's key range, usable as a
    * skip index). One map-side-combinable groupBy; argmin/argmax via
    * `min(struct(hash, id))` keeps the state O(1) per shard per task.
    *
    * @return (shard, n_docs, total_chars, total_tokens, n_langs,
    *         first_doc, last_doc) ordered by shard.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    langCol: String, charsCol: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = knuthHash(col(idCol))
    df.select(pmod(h, lit(nShards.toLong)).as("shard"),
        col(idCol).as("id"), col(langCol).as("lang"),
        col(charsCol).cast("long").as("chars"),
        TextOps.tokenCount(col(textCol)).cast("long").as("toks"),
        h.as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("total_chars"),
        sum(col("toks")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        min(struct(col("h"), col("id"))).getField("id").as("first_doc"),
        max(struct(col("h"), col("id"))).getField("id").as("last_doc"))
      .orderBy(col("shard"))
  }
}
