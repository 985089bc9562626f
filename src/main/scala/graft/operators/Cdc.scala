package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-data-capture shapes: keyed snapshot diff and SCD2 (slowly
  * changing dimension, type 2) historization — the delta-detection half
  * of a warehouse load that the reference drives with per-row DBMS merges
  * (/root/reference/Wrap/DB.pm:166-420's primkey update/insert logic),
  * re-expressed as set operations so the cluster does one shuffle on the
  * key instead of a driver-side row loop.
  */
object Cdc {

  /** Compare two keyed snapshots → one row per changed key with
    * `status` ∈ insert | delete | update and `changed_cols` (comma list,
    * deterministic column order). Unchanged keys are dropped.
    *
    * Plan shape: ONE full-outer sort-merge/shuffled-hash join on the key
    * columns — no broadcast of either side assumed (snapshots are both
    * big); AQE handles skewed keys. Null-safe comparison (`<=>`) so a
    * NULL→value transition registers as a change.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty)
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_old", lit(1))
      .toDF(keys ++ compareCols.map(_ + "_old") :+ "_old": _*)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("_new", lit(1))
      .toDF(keys ++ compareCols.map(_ + "_new") :+ "_new": _*)
    val joined = o.join(n, keys, "full_outer")
    val differs = compareCols.map(c =>
      !(col(c + "_old") <=> col(c + "_new")))
    val anyDiff = differs.reduce(_ || _)
    val changed = concat_ws(",",
      compareCols.zip(differs).map { case (c, d) =>
        when(d, lit(c)) }: _*)
    joined.select(keys.map(col) ++ Seq(
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(anyDiff, lit("update"))
          .otherwise(lit("same")).as("status"),
        when(col("_old").isNotNull && col("_new").isNotNull && anyDiff,
          changed).otherwise(lit("")).as("changed_cols")) ++
        compareCols.flatMap(c => Seq(col(c + "_old"), col(c + "_new"))): _*)
      .filter(col("status") =!= "same")
  }

  /** Build an SCD2 dimension from a change log: suppress no-op changes
    * (rows whose tracked attributes equal the previous row's), then emit
    * one validity interval per surviving change — `valid_from_us` /
    * `valid_to_us` (epoch micros; open interval = NULL), `version`
    * (1-based per key), `is_current`.
    *
    * Both window passes share one partitioning (the key) and one sort
    * (`tsCol`, `tieCol`), so Catalyst plans a single exchange + sort with
    * two Window operators chained over it — one shuffle total regardless
    * of log size.
    */
  def scd2(changelog: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    val real = changelog
      .withColumn("_changed", !(lag(attrs, 1).over(w) <=> attrs))
      .filter(col("_changed"))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    real.select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        unix_micros(col(tsCol)).as("valid_from_us"),
        unix_micros(lead(col(tsCol), 1).over(w2)).as("valid_to_us"),
        row_number().over(w2).cast("long").as("version")): _*)
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
