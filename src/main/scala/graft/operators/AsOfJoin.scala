package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (time-travel) join — an operator vanilla Spark lacks: for every
  * left row, the latest right row with `rightTs <= leftTs` per key.
  *
  * Implemented with the union + running-last trick rather than a
  * window-per-right-row join: both sides are tagged and unioned, one
  * window pass per key in (ts, side) order carries the most recent right
  * payload forward, and the left rows are filtered back out. Cost: ONE
  * shuffle on the key and a sort — no pair explosion, no range condition
  * to nested-loop over; scales linearly with |L|+|R| at any key
  * cardinality (the classic distributed as-of shape).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `payload` columns are carried)
    * @param keys      equi-join keys
    * @param leftTs / rightTs  ordering columns (same type)
    * @param payload   right columns to carry to the matched left row
    *                  (exposed as `asof_<name>`)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tagged union: right rows sort before left rows at equal timestamps
    // (an exactly-simultaneous right row matches, like DuckDB ASOF >=)
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(c => keys.contains(c)).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        payload.map(c => lit(null).as(s"__p_$c")) ++
        leftCols.filterNot(c => keys.contains(c)).map(col): _*)
    val unioned = taggedRight.unionByName(taggedLeft)
    // final tiebreak: among right rows sharing (key, ts), the
    // lexicographically greatest payload row sorts last and is the one
    // carried — without it, `last(..., ignoreNulls)` would pick an
    // arbitrary row among ties and the result would be nondeterministic
    val tieBreak = struct(payload.map(c => col(s"__p_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), tieBreak.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"asof_$c")): _*)
  }
}
