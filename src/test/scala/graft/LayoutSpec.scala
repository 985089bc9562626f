package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order clustering: the z-value expression must match a reference bit
  * interleave, and the written layout must bound per-file min/max ranges
  * on BOTH clustering columns — the property parquet footer pruning
  * depends on. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for ((v, ci) <- vals.zipWithIndex; i <- 0 until bits) {
      val c = math.min(math.max(v, 0L), (1L << bits) - 1)
      z |= ((c >> i) & 1L) << (i * vals.size + ci)
    }
    z
  }

  test("zValue matches the reference interleave, including clamping") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (-7L, 70000L), (42L, 42L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => refZ(Seq(a, b), 16) })
    // three columns, narrower bit budget
    val g3 = Seq((5L, 3L, 7L)).toDF("a", "b", "c")
      .select(Layout.zValue(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .as[Long].head()
    assert(g3 == refZ(Seq(5L, 3L, 7L), 8))
  }

  test("z-ordered layout bounds per-file ranges on both columns") {
    val dir = Files.createTempDirectory("graft-zorder-").toString
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_custkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("day"))
    val nFiles = 64

    Layout.storeZOrdered(orders, s"$dir/z",
      Seq(col("o_custkey"), col("day")), nFiles)
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.parquet(s"$dir/bycust")

    def avgRange(path: String, c: String): Double = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("r"))
        .agg(avg(col("r"))).as[Double].head()
      r
    }
    val Seq(daySpan, custSpan) = orders
      .agg(max($"day") - min($"day"), max($"o_custkey") - min($"o_custkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long].toDouble)

    // single-column sort: day ranges stay near the full span (no pruning
    // possible on day); z-order: BOTH per-file ranges well under the span
    val zDay = avgRange(s"$dir/z", "day")
    val zCust = avgRange(s"$dir/z", "o_custkey")
    val sortedDay = avgRange(s"$dir/bycust", "day")
    assert(sortedDay > 0.8 * daySpan, s"bycust day range $sortedDay vs span $daySpan")
    assert(zDay < 0.4 * daySpan, s"z day range $zDay vs span $daySpan")
    assert(zCust < 0.4 * custSpan, s"z cust range $zCust vs span $custSpan")
  }
}
