package graft

import graft.sinks.ParquetTable
import java.nio.file.{Files, Paths}

/** Small-file compaction: many-fragment tables collapse to the computed
  * file count with identical content, atomically. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact collapses a fragmented table, content unchanged") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/t"
    // 32 tiny files
    (1 to 320).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(32).write.parquet(dir)
    def partFiles = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(p => p.contains("part-") && p.endsWith(".parquet"))
    assert(partFiles == 32)
    val before = ParquetTable.load(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    ParquetTable.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(partFiles == 1, "tiny table must compact to a single file")
    val after = ParquetTable.load(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before)
  }

  test("partitioned compaction preserves layout, content, and pruning") {
    val dir = Files.createTempDirectory("graft-compact3-").toString + "/t"
    val df = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("k", "p")
      .repartition(8)
    ParquetTable.storePartitioned(spark, df, dir, Seq("p"))
    def files(part: String) = Files.list(Paths.get(dir, s"p=$part")).toArray
      .map(_.toString).count(f => f.contains("part-") && f.endsWith(".parquet"))
    assert(files("a") > 1 && files("b") > 1)
    ParquetTable.compactPartitioned(spark, dir, targetBytes = Long.MaxValue)
    assert(files("a") == 1 && files("b") == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    // partition pruning still applies after the rewrite
    val plan = back.filter(org.apache.spark.sql.functions.col("p") === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["))
    assert(back.filter("p = 'a'").count() == 100)
  }

  test("crash between the two swap renames heals on next touch") {
    val dir = Files.createTempDirectory("graft-recover-").toString + "/t"
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v").write.parquet(dir)
    // simulate the crash window: live table retired to .old-graft, new
    // version never moved in (the state atomicOverwrite can die in)
    Files.move(Paths.get(dir), Paths.get(dir + ".old-graft"))
    assert(!Files.exists(Paths.get(dir)))
    // any entry point must restore the retired version
    assert(ParquetTable.exists(dir), "recovery probe did not restore the table")
    assert(ParquetTable.load(spark, dir).count() == 10)
    assert(!Files.exists(Paths.get(dir + ".old-graft")))
  }

  test("compact file count scales with target size") {
    val dir = Files.createTempDirectory("graft-compact2-").toString + "/t"
    (1 to 1000).map(i => (i.toLong, "x" * 50)).toDF("k", "v")
      .repartition(16).write.parquet(dir)
    val total = Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_))
      .mapToLong(Files.size(_)).sum()
    ParquetTable.compact(spark, dir, targetBytes = total / 4 + 1)
    val n = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .count(p => p.contains("part-") && p.endsWith(".parquet"))
    assert(n == 4, s"expected 4 files, got $n")
  }
}
