package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated test data (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst's column pruning and predicate
  * pushdown reach the file source (`PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`). At cluster scale the same call works unchanged
  * on a partitioned table directory.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`, and this
    * loader restores a proper microsecond timestamp via exact integer
    * division (a double-based divide would lose precision on epoch-nanos).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
