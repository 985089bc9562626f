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
}
