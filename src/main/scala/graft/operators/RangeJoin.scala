package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval/range join: points joined to the intervals that
  * contain them, planned as an EQUI-join instead of the
  * BroadcastNestedLoopJoin Spark falls back to for a bare
  * `p >= start AND p < end` condition (which at 100 TB is a cartesian
  * scan of every point against every interval).
  *
  * Standard binning scheme: pick a bin width, explode each interval to
  * every bin it overlaps (`sequence(floor(start/w), floor((end-1)/w))`),
  * map each point to the single bin that owns it, equi-join on the bin,
  * then re-apply the exact range predicate as a post-join filter. Each
  * (point, interval) match meets in exactly ONE bin — the point's own —
  * so no dedup pass is needed. The equi-join shuffles (or broadcasts)
  * on the bin key, partial work scales out with partitions, and skew in
  * bin population is ordinary join skew (AQE-splittable), not a plan
  * change.
  *
  * Bin width trades replication (long intervals explode to `len/w` bins)
  * against candidate density (wide bins pair points with far-away
  * intervals that the filter then drops). A width near the median
  * interval length keeps replication ~2× and candidates tight.
  */
object RangeJoin {

  /** All binned joins here compute the last covered bin as
    * `bin(end - 1)` and the emit-once guard as `max(startBin)` — both
    * only correct when the coordinates are exact integers (fractional
    * ends, e.g. `end = 7.5` with `binWidth = 7`, would miscompute the
    * covered-bin range and silently drop overlapping pairs). Enforce at
    * plan-build time instead of documenting and hoping. */
  private def requireIntegral(df: DataFrame, cols: String*): Unit =
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.ByteType] ||
          dt.isInstanceOf[org.apache.spark.sql.types.ShortType] ||
          dt.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
          dt.isInstanceOf[org.apache.spark.sql.types.LongType],
        s"RangeJoin: column '$c' must be an integral type (byte/short/" +
          s"int/long) — got $dt; cast timestamps/doubles to epoch longs " +
          "first, fractional coordinates silently lose pairs")
    }

  /** Join `points` to every row of `intervals` whose
    * `[startCol, endCol)` half-open range contains `pointCol`.
    *
    * All three columns must be long-typed (callers convert dates or
    * timestamps to epoch units first — exact integer arithmetic, no
    * float bin edges).
    *
    * @param binWidth bin width in the same units as the columns.
    * @return one row per containment pair, carrying all columns of both
    *         inputs.
    */
  def intervalJoin(points: DataFrame, pointCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(points, pointCol)
    requireIntegral(intervals, startCol, endCol)
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    // empty intervals (end <= start) own no bins; sequence() would count
    // backwards (step -1) and fabricate bins, so they are filtered first
    val ivb = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol) - 1))))
    val ptb = points.withColumn("__bin", bin(col(pointCol)))
    ptb.join(ivb, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** INTERVAL-interval overlap join: every pair (a, b) whose half-open
    * ranges `[aStart, aEnd) × [bStart, bEnd)` intersect, planned as the
    * same binned equi-join — both sides explode to their covered bins,
    * pairs meet in every shared bin, and the EMIT-ONCE guard keeps only
    * the first shared bin (the max of the two start bins: both sides
    * provably cover it, no earlier bin is shared, so each overlapping
    * pair survives exactly once — no distinct pass, the
    * [[Dedup.firstCollisionOnly]] idea in bin space). The exact overlap
    * predicate re-applies post-join; empty intervals match nothing.
    *
    * Left columns must be distinct from right columns (alias before
    * calling). Output carries all columns of both inputs. All four
    * coordinate columns must be integral (see [[requireIntegral]]).
    *
    * SCALE WARNING — the unkeyed pair count grows with interval density
    * SQUARED (measured 84× output at 100× data); production callers
    * should reach for [[overlapJoinKeyed]], which bounds every join
    * group by a partition key. The quadratic path therefore has to be
    * opted into explicitly: calling this without `allowUnkeyed = true`
    * throws at plan-build time. */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
                  right: DataFrame, rStart: String, rEnd: String,
                  binWidth: Long, allowUnkeyed: Boolean = false): DataFrame = {
    require(allowUnkeyed,
      "overlapJoin without a key is output-bound (pair count ~ interval " +
        "density squared). Use overlapJoinKeyed, or pass " +
        "allowUnkeyed = true to accept the quadratic output explicitly.")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(left, lStart, lEnd)
    requireIntegral(right, rStart, rEnd)
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val lb = left.filter(col(lEnd) > col(lStart))
      .withColumn("__bin", explode(sequence(bin(col(lStart)), bin(col(lEnd) - 1))))
    val rb = right.filter(col(rEnd) > col(rStart))
      .withColumn("__bin", explode(sequence(bin(col(rStart)), bin(col(rEnd) - 1))))
    lb.join(rb, Seq("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") ===
        greatest(bin(col(lStart)), bin(col(rStart)))) // emit-once
      .drop("__bin")
  }

  /** KEYED overlap join: overlaps only within matching `(lKey, rKey)`
    * partitions (tenant, customer, shard). This is the scale mitigation
    * the bare [[overlapJoin]] documents: without a key, the TRUE pair
    * count grows with interval density squared (output-bound, 84×
    * measured at 100× data); the key bounds each join group, restoring
    * ~linear scaling, and rides the same equi-join (bin AND key) with
    * the same emit-once guard. */
  def overlapJoinKeyed(left: DataFrame, lKey: String, lStart: String,
                       lEnd: String, right: DataFrame, rKey: String,
                       rStart: String, rEnd: String,
                       binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireIntegral(left, lStart, lEnd)
    requireIntegral(right, rStart, rEnd)
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val lb = left.filter(col(lEnd) > col(lStart))
      .withColumn("__bin", explode(sequence(bin(col(lStart)), bin(col(lEnd) - 1))))
    val rb = right.filter(col(rEnd) > col(rStart))
      .withColumn("__bin", explode(sequence(bin(col(rStart)), bin(col(rEnd) - 1))))
    lb.join(rb, col(lKey) === col(rKey) && lb("__bin") === rb("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(lb("__bin") ===
        greatest(bin(col(lStart)), bin(col(rStart)))) // emit-once
      .drop("__bin")
  }
}
