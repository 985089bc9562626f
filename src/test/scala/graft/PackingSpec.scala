package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Profile, Sampling}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tokens"))

  test("packSequences: offsets are contiguous within each shard") {
    val p = Packing.packSequences(docs, "doc_id", "n_tokens",
      capacity = 128, nShards = 4, seed = 5L)
    // per shard: sorted by start_offset, each doc starts where the
    // previous ended, starting at 0
    val rows = p.select("shard", "start_offset", "n_tokens").collect()
      .groupBy(_.getInt(0)).values
    rows.foreach { shardRows =>
      val sorted = shardRows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(1) + a.getLong(2) == b.getLong(1))
        case _ =>
      }
    }
  }

  test("packSequences: pack bounds match offset arithmetic and crosses flag") {
    val p = Packing.packSequences(docs, "doc_id", "n_tokens",
      capacity = 128, nShards = 4, seed = 5L).collect()
    p.foreach { r =>
      val (off, n) = (r.getAs[Long]("start_offset"), r.getAs[Long]("n_tokens"))
      val first = off / 128
      val last = math.max((off + n - 1) / 128, first)
      assert(r.getAs[Long]("pack_first") == first)
      assert(r.getAs[Long]("pack_last") == last)
      assert(r.getAs[Boolean]("crosses") == (last > first))
    }
  }

  test("packSequences is invariant under input partitioning") {
    val a = Packing.packSequences(docs, "doc_id", "n_tokens", 128, 4, 5L)
    val b = Packing.packSequences(docs.repartition(7), "doc_id", "n_tokens", 128, 4, 5L)
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq)
  }

  test("epochMixRational replicates by integer epochs and hash fraction") {
    val df = Seq((1L, "s"), (2L, "s"), (3L, "s"), (4L, "s")).toDF("id", "src")
    // epochs 2.5 → every row twice, hash-selected rows three times
    val out = Sampling.epochMixRational(df, "id", lit(25L), den = 10, seed = 3L)
    val counts = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.values.foreach(c => assert(c == 2L || c == 3L))
    // copy ids are dense 0..n-1
    val bad = out.groupBy("id").agg(max("copy_id").as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c") - 1)
    assert(bad.count() == 0)
    // deterministic
    assert(out.collect().toSet ==
      Sampling.epochMixRational(df.repartition(3), "id", lit(25L), 10, 3L)
        .collect().toSet)
  }

  test("epochMix: sub-1 epochs downsample (zero copies drop the row)") {
    val df = (1L to 100L).map(i => (i, "s")).toDF("id", "src")
    val out = Sampling.epochMix(df, "src", "id", Seq("s" -> 0.3), seed = 9L)
    val n = out.select("id").distinct().count()
    assert(n > 10 && n < 60) // ~30 of 100
    assert(out.groupBy("id").count().filter(col("count") =!= 1).count() == 0)
  }

  test("tokenBudget keeps docs whole and stops past the budget") {
    val df = Seq((1L, "a", 50L), (2L, "a", 60L), (3L, "a", 70L),
      (4L, "b", 500L)).toDF("id", "src", "n")
    val out = Sampling.tokenBudget(df, "src", "id", "n", budget = 100L, seed = 1L)
    // every kept doc starts under budget
    assert(out.filter(col("tokens_before") >= 100L).count() == 0)
    // b's single 500-token doc survives (starts at 0)
    assert(out.filter(col("src") === "b").count() == 1)
    // invariant under partitioning
    assert(out.orderBy("id").collect().toSeq ==
      Sampling.tokenBudget(df.repartition(5), "src", "id", "n", 100L, 1L)
        .orderBy("id").collect().toSeq)
  }

  test("profile: one row per column with exact stats") {
    val df = Seq((1L, Option("ab"), Option(1.5)), (2L, Option("cdef"), None),
      (3L, None, Option(2.5))).toDF("k", "s", "v")
    val p = Profile.profile(df, numericCols = Seq("k", "v"), stringCols = Seq("s"))
      .orderBy("column_name").collect()
    assert(p.map(_.getString(0)).toSeq == Seq("k", "s", "v"))
    val k = p(0); val s = p(1); val v = p(2)
    assert(k.getAs[Long]("n_rows") == 3 && k.getAs[Long]("n_nulls") == 0 &&
      k.getAs[Long]("n_distinct") == 3 && k.getAs[Double]("min_num") == 1.0 &&
      k.getAs[Double]("max_num") == 3.0)
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[String]("min_str") == "ab" &&
      s.getAs[String]("max_str") == "cdef" && s.getAs[Double]("avg_len") == 3.0)
    assert(v.getAs[Long]("n_nulls") == 1 && v.getAs[Double]("min_num") == 1.5 &&
      v.getAs[Double]("max_num") == 2.5)
  }
}
