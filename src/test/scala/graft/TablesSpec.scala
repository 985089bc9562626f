package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `Tables.events` normalization contract: whatever physical
  * encoding the driver-regenerated `events.parquet` ships with — epoch
  * nanos as long (under `nanosAsLong`), `timestamp[us]` with
  * `isAdjustedToUTC=0` (Spark 4's TIMESTAMP_NTZ), or a plain session-TZ
  * timestamp — `events.ts` must come back as session-TZ `TimestampType`
  * with identical instant values. A regeneration that silently flips the
  * physical type broke six queries for two rounds; this spec makes the
  * next flip a loud unit-test failure instead.
  */
class TablesSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("events.ts is session-TZ TimestampType for the shipped encoding") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    // and it must be usable by the downstream surface that broke: unix_micros
    val n = ev.select(unix_micros(col("ts"))).filter(col("unix_micros(ts)").isNotNull).count()
    assert(n > 0)
  }

  test("events.ts normalizes all three physical encodings to the same instants") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-tables-").toString
    val base = Tables.events(spark, sfDir).select("ts", "event_id").limit(100).cache()
    val want = base.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // (1) long epoch-nanos (legacy nanosAsLong read shape)
    base.select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"))
      .select(col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/long")
    // (2) TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=0)
    base.select(col("ts").cast(TimestampNTZType).as("ts"), col("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/ntz")
    // (3) plain session-TZ timestamp
    base.select(col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/tz")

    for (enc <- Seq("long", "ntz", "tz")) {
      // route through Tables.events by reading from a directory that holds
      // the synthesized file under the expected name
      val dir = s"$tmp/$enc-dir"
      new java.io.File(dir).mkdirs()
      spark.read.parquet(s"$tmp/$enc").write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Tables.events(spark, dir)
      assert(got.schema("ts").dataType === TimestampType, s"encoding=$enc")
      val gotMap = got.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotMap === want, s"encoding=$enc produced different instants")
    }
    base.unpersist()
  }
}
