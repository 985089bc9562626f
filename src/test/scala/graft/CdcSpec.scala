package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/delete/update and names changed cols") {
    val old = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0),
      (4L, "D", 40.0)).toDF("k", "s", "v")
    val neu = Seq((1L, "A", 10.0), (2L, "X", 20.0), (3L, "C", 35.0),
      (5L, "E", 50.0)).toDF("k", "s", "v")
    val d = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
    assert(d.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((2L, "update", "s"), (3L, "update", "v"),
        (4L, "delete", ""), (5L, "insert", "")))
  }

  test("snapshotDiff treats NULL transitions as changes (null-safe compare)") {
    val old = Seq((1L, Option("A")), (2L, Option.empty[String])).toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val d = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s")).collect()
    assert(d.length == 1 && d(0).getLong(0) == 1L && d(0).getString(1) == "update")
  }

  test("scd2 suppresses no-op changes and builds contiguous intervals") {
    val log = Seq(
      (1L, 1000L, 1L, "a"), (1L, 2000L, 2L, "a"), // no-op change suppressed
      (1L, 3000L, 3L, "b"), (1L, 4000L, 4L, "a"),
      (2L, 1000L, 5L, "x"))
      .toDF("k", "us", "id", "attr")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Cdc.scd2(log, Seq("k"), "ts", "id", Seq("attr"))
      .orderBy("k", "version")
      .select("k", "attr", "valid_from_us", "valid_to_us", "version", "is_current")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getLong(4), r.getBoolean(5))).toSeq ==
      Seq((1L, "a", 1000L, Some(3000L), 1L, false),
        (1L, "b", 3000L, Some(4000L), 2L, false),
        (1L, "a", 4000L, None, 3L, true),
        (2L, "x", 1000L, None, 1L, true)))
  }

  test("scd2 intervals tile each key: next valid_from equals prior valid_to") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val h = Cdc.scd2(ev, Seq("user_id"), "ts", "event_id", Seq("event_type"))
    val bad = h.withColumn("next_from",
        lead(col("valid_from_us"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("version")))
      .filter(col("valid_to_us").isNotNull &&
        !(col("valid_to_us") === col("next_from")))
    assert(bad.count() == 0)
    // exactly one current row per key
    val cur = h.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") =!= 1)
    assert(cur.count() == 0)
  }
}
