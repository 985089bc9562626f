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
  /** events.parquet has shipped with three physical encodings of `ts`:
    * TIMESTAMP(NANOS) (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong`), `timestamp[us]` with
    * `isAdjustedToUTC=0` (Spark 4 reads it as TIMESTAMP_NTZ), and plain
    * session-TZ timestamps. This loader normalizes all three to session-TZ
    * `TimestampType` so every downstream `unix_micros`/window works
    * unchanged. Sessions pin UTC, so the NTZ cast is value-preserving; the
    * nanos case uses exact integer division (a double divide would lose
    * precision on epoch-nanos).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
