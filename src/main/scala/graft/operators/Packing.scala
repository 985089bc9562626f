package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-window preparation: the concat-then-chunk
  * layout (documents concatenated in a deterministic order, the token
  * stream cut into fixed-capacity packs) used to fill pretraining context
  * windows without padding.
  *
  * A single global concatenation order would be one giant window sort —
  * a scale-killer at corpus size — so packing is SHARDED: each document
  * lands in `pmod(keyhash, nShards)` and the cumulative token offsets are
  * computed per shard (`Window.partitionBy(shard)`). Shards sort in
  * parallel across the cluster; at 100 TB you raise `nShards` so one
  * shard's token stream fits an executor's sort budget. The hash order
  * inside a shard doubles as deterministic document shuffling (stable
  * under repartitioning, recomputable in SQL — same discipline as
  * [[Sampling]]).
  *
  * Emitted per document: its shard, start offset in the shard's token
  * stream, and the first/last pack index it occupies (`capacity`-token
  * packs, zero-based) plus a boundary-crossing flag — everything a
  * downstream window materializer needs to slice actual token arrays.
  */
object Packing {

  /** Assign each row a shard + pack placement. `nTokensCol` must be a
    * non-negative integral column (token counts). */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Int, nShards: Int,
                    seed: Long = 42L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(nShards > 0, "nShards must be positive")
    val h = Sampling.keyHashFor(df, idCol, seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(nTokensCol).cast("long")
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("_cum", sum(n).over(w))
      .select(col(idCol), col("shard"),
        (col("_cum") - n).as("start_offset"),
        n.as(nTokensCol),
        floor((col("_cum") - n) / capacity).as("pack_first"),
        // last token sits at _cum - 1; empty docs (n = 0) degenerate to
        // their start pack rather than a negative index
        greatest(floor((col("_cum") - lit(1)) / capacity),
          floor((col("_cum") - n) / capacity)).as("pack_last"))
      .withColumn("crosses", col("pack_last") > col("pack_first"))
  }
}
