package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed-table co-located join (SURVEY.md "Partitioning & shuffle"):
  * writing both join sides bucketed by the key lets the join run without
  * any exchange — at 100 TB this turns the nightly fact⋈fact join from a
  * full-cluster shuffle into a local merge per bucket. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without an exchange") {
    // warehouse dir is a static conf - the shared session uses the default
    // ./spark-warehouse (gitignored); tables are dropped at the end
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // orphaned locations (metastore lost between JVMs) block CREATE TABLE
    for (t <- Seq("b_lineitem", "b_orders")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").saveAsTable("b_lineitem")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").saveAsTable("b_orders")

    // the tiny test tables would be broadcast (which also avoids the
    // shuffle, but hides the bucketing effect under test) — force the
    // merge-join path a 100 TB fact⋈fact join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) = try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      (j, j.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // co-bucketed: the sort-merge join must read both sides without a
    // shuffle (no Exchange below the join)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a merge join, got:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not re-shuffle:\n$plan")
    // and the result matches the plain parquet join
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }
}
