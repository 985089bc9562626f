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
