package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact order statistics without Spark's `percentile` aggregate.
  *
  * `percentile` buffers every distinct value of a group in one aggregation
  * buffer merged on a single reducer — with near-continuous doubles at
  * 100 TB that buffer is the whole group and the reducer OOMs. This
  * operator computes the same interpolated percentile from order
  * statistics instead:
  *
  *  1. rank rows per group with a window (`row_number` — an external sort
  *     that spills, never an in-memory map);
  *  2. count rows per group (map-side partial agg, tiny result, broadcast
  *     back);
  *  3. pick the floor/ceil-rank rows per requested fraction inside a
  *     regular hash aggregation and interpolate.
  *
  * The window shuffle on the group key is the only full-data shuffle; the
  * final groupBy reuses its partitioning (no second exchange), so the
  * plan survives a 100× scale-up with bounded per-task memory.
  *
  * Interpolation mirrors Spark's `Percentile.getPercentile` double
  * arithmetic — `(hi - pos)·v_lo + (pos - lo)·v_hi`, degenerate case
  * `pos` integral → `v_lo` — which is also DuckDB `quantile_cont`'s
  * formula, keeping results bit-exact across engines.
  */
object OrderStats {

  /** Exact interpolated percentiles per group.
    *
    * @param specs (outputColumn, valueColumn, fraction) triples; value
    *              columns may repeat with different fractions.
    * @return one row per group: groupCols ++ specs' output columns
    *         (double).
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
                       specs: Seq[(String, String, Double)]): DataFrame = {
    val g = groupCols.map(col)
    val valueCols = specs.map(_._2).distinct
    // one row_number per distinct value column; same partitioning → one
    // exchange, one extra sort per ordering
    val ranked = valueCols.foldLeft(
        df.select((groupCols ++ valueCols).distinct.map(col): _*)) {
      (d, vc) =>
        d.withColumn(s"__rn_$vc", row_number().over(
          Window.partitionBy(g: _*).orderBy(col(vc))))
    }
    val counts = df.groupBy(g: _*).agg(count(lit(1)).as("__n"))
    val withN = ranked.join(broadcast(counts), groupCols)
    val aggExprs = specs.flatMap { case (name, vc, p) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      val rn = col(s"__rn_$vc") - 1 // 0-based rank, comparable to floor/ceil(pos)
      Seq(
        max(when(rn === floor(pos), col(vc).cast("double"))).as(s"__lo_$name"),
        max(when(rn === ceil(pos), col(vc).cast("double"))).as(s"__hi_$name"),
        first(pos).as(s"__pos_$name"))
    }
    val agged = withN.groupBy(g: _*).agg(aggExprs.head, aggExprs.tail: _*)
    val withValues = specs.foldLeft(agged) { case (d, (name, _, _)) =>
      val pos = col(s"__pos_$name")
      val lo = floor(pos)
      val hi = ceil(pos)
      d.withColumn(name,
        when(lo === hi, col(s"__lo_$name"))
          .otherwise((hi.cast("double") - pos) * col(s"__lo_$name") +
                     (pos - lo.cast("double")) * col(s"__hi_$name")))
    }
    withValues.select(g ++ specs.map(s => col(s._1)): _*)
  }

  /** Single-pass histogram quantile ESTIMATE per group — the bounded-state
    * complement to [[exactPercentiles]]: one shuffle on (group, bin), a
    * fixed `nBins`-row state per group regardless of group size, and the
    * per-(group, bin) counts are a mergeable sketch (union = add counts)
    * storable across incremental loads. Error is bounded by the bin width
    * `(hi-lo)/nBins`; the estimate returned is the upper edge of the first
    * bin whose cumulative count reaches the fraction.
    *
    * Values below `lo` / above `hi` clamp into the edge bins. All
    * arithmetic is plain IEEE double in an exactly mirrorable expression
    * order (`floor((v - lo) * nBins / (hi - lo))`), so a SQL engine
    * replays the sketch bit-for-bit — which is how the q78 gate verifies
    * it.
    *
    * @param fractions (outputColumn, fraction) pairs.
    */
  def histQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    lo: Double, hi: Double, nBins: Int,
                    fractions: Seq[(String, Double)]): DataFrame = {
    require(nBins > 0 && hi > lo, s"need nBins > 0 and hi > lo, got $nBins, [$lo, $hi]")
    val g = groupCols.map(col)
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo)),
      lit(0.0)), lit((nBins - 1).toDouble)).cast("long")
    val counts = df.groupBy(g :+ bin.as("__bin"): _*).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__bin"))
    val wAll = Window.partitionBy(g: _*)
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(wCum).cast("double"))
      .withColumn("__tot", sum(col("__c")).over(wAll).cast("double"))
    val aggs = fractions.map { case (name, f) =>
      min(when(col("__cum") >= lit(f) * col("__tot"),
        lit(lo) + (col("__bin") + 1).cast("double") * lit(hi - lo) / lit(nBins.toDouble)))
        .as(name)
    }
    cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }
}
