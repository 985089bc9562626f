package graft

import graft.operators.RangeJoin
import graft.plans.BoundedMinKAgg
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** RangeJoin binning rewrite and the BoundedMinKAgg bounded top-k
  * aggregate: results must match the naive formulations exactly, under
  * any partitioning (the merge path must be exercised). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def minK(c: org.apache.spark.sql.Column, k: Int, distinct: Boolean) =
    GraftColumnBridge.column(
      BoundedMinKAgg(GraftColumnBridge.expression(c), k, distinct)
        .toAggregateExpression())

  test("overlapJoin matches the naive theta join, each pair exactly once") {
    val rnd = new scala.util.Random(19)
    val left = (0 until 60).map { i =>
      val s = rnd.nextInt(300).toLong; (i.toLong, s, s + 1 + rnd.nextInt(40))
    }.toDF("a_id", "a_s", "a_e")
    val right = (0 until 60).map { i =>
      val s = rnd.nextInt(300).toLong; (i.toLong, s, s + 1 + rnd.nextInt(40))
    }.toDF("b_id", "b_s", "b_e")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.overlapJoin(left, "a_s", "a_e", right, "b_s", "b_e",
          w, allowUnkeyed = true)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val want = left.join(right, $"a_s" < $"b_e" && $"b_s" < $"a_e")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == want.sorted, s"w=$w: pair sets differ")
      assert(got.size == got.distinct.size, s"w=$w: duplicate pair emitted")
    }
  }

  test("overlapJoinKeyed matches the keyed theta join, no duplicates") {
    val rnd = new scala.util.Random(23)
    val left = (0 until 80).map { i =>
      val s = rnd.nextInt(200).toLong
      (i.toLong, (i % 4).toLong, s, s + 1 + rnd.nextInt(30))
    }.toDF("a_id", "a_k", "a_s", "a_e")
    val right = (0 until 80).map { i =>
      val s = rnd.nextInt(200).toLong
      (i.toLong, (i % 4).toLong, s, s + 1 + rnd.nextInt(30))
    }.toDF("b_id", "b_k", "b_s", "b_e")
    for (w <- Seq(1L, 16L, 500L)) {
      val got = RangeJoin.overlapJoinKeyed(left, "a_k", "a_s", "a_e",
          right, "b_k", "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val want = left.join(right,
          $"a_k" === $"b_k" && $"a_s" < $"b_e" && $"b_s" < $"a_e")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == want.sorted, s"w=$w: pair sets differ")
      assert(got.size == got.distinct.size, s"w=$w: duplicate pair emitted")
    }
  }

  test("unkeyed overlapJoin must be opted into; fractional coords rejected") {
    val l = Seq((1L, 0L, 5L)).toDF("a_id", "a_s", "a_e")
    val r = Seq((2L, 3L, 9L)).toDF("b_id", "b_s", "b_e")
    // default (allowUnkeyed = false) refuses the quadratic path
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(l, "a_s", "a_e", r, "b_s", "b_e", 4L)
    }
    assert(e1.getMessage.contains("overlapJoinKeyed"))
    // fractional coordinates would silently drop pairs -> rejected
    val lf = Seq((1L, 0.0, 7.5)).toDF("a_id", "a_s", "a_e")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(lf, "a_s", "a_e", r, "b_s", "b_e", 7L,
        allowUnkeyed = true)
    }
    assert(e2.getMessage.contains("integral"))
    val pf = Seq((1L, 2.5)).toDF("p_id", "p")
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(pf, "p", r, "b_s", "b_e", 4L)
    }
    assert(e3.getMessage.contains("integral"))
  }

  test("intervalJoin matches the naive range predicate join") {
    val points = (0L until 200L).map(p => (p, s"p$p")).toDF("x", "ptag")
    // intervals of assorted lengths incl. zero-length, longer-than-bin,
    // and bin-straddling ones
    val intervals = Seq(
      (0L, 5L, "a"), (4L, 30L, "b"), (10L, 10L, "empty"),
      (17L, 18L, "tiny"), (50L, 199L, "long"), (190L, 300L, "tail"),
      (7L, 8L, "inner")).toDF("s", "e", "itag")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalJoin(points, "x", intervals, "s", "e", w)
        .select("x", "itag").as[(Long, String)].collect().sorted.toSeq
      val want = points.join(intervals, $"x" >= $"s" && $"x" < $"e")
        .select("x", "itag").as[(Long, String)].collect().sorted.toSeq
      assert(got == want, s"binWidth=$w")
      assert(!got.exists(_._2 == "empty"), "zero-length interval must match nothing")
    }
  }

  test("intervalJoin emits each containment pair exactly once") {
    val points = Seq(Tuple1(10L)).toDF("x")
    val intervals = Seq((0L, 100L, "wide")).toDF("s", "e", "itag")
    // interval spans many bins; the point must meet it only in its own bin
    val got = RangeJoin.intervalJoin(points, "x", intervals, "s", "e", 3L).count()
    assert(got == 1L)
  }

  test("BoundedMinKAgg keeps the k smallest, distinct or not, any partitioning") {
    val data = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L, 1L, 8L)
    for (parts <- Seq(1, 4, 9)) {
      val df = data.toDF("v").repartition(parts)
      val plain = df.agg(minK(col("v"), 4, distinct = false).as("a"))
        .as[Seq[Long]].head()
      assert(plain == Seq(1L, 1L, 1L, 3L), s"parts=$parts")
      val dist = df.agg(minK(col("v"), 4, distinct = true).as("a"))
        .as[Seq[Long]].head()
      assert(dist == Seq(1L, 3L, 5L, 7L), s"parts=$parts")
    }
  }

  test("BoundedMinKAgg orders structs field-by-field and skips nulls") {
    val df = Seq((Some(2L), 10L), (Some(1L), 20L), (Some(1L), 5L), (None, 99L))
      .toDF("a", "b").repartition(3)
    val entry = when(col("a").isNotNull, struct(col("a"), col("b"))).otherwise(lit(null))
    val got = df.agg(minK(entry, 2, distinct = false).as("top"))
      .selectExpr("transform(top, e -> e.b) AS bs").as[Seq[Long]].head()
    assert(got == Seq(5L, 20L), "expected (1,5) then (1,20); null row skipped")
  }

  test("blockedFuzzyPairs finds near matches and respects the distance cap") {
    val docs = Seq(
      (1L, "The quick   Brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),   // dist 3 to 1
      (3L, "the quick brown fox leaps over seventeen enormous logs"), // same block, far
      (4L, "completely different text that shares no prefix at all"),
      (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG tonight")     // dist 0 to 1
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .blockedFuzzyPairs(docs, "doc_id", "text", blockLen = 16, cmpLen = 60, maxDist = 4)
      .orderBy("a_id", "b_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L), (1L, 5L, 0L), (2L, 5L, 3L)), s"got $got")
  }

  test("BoundedMinKAgg buffer stays bounded under a hot group") {
    // 10k rows, one group — the point of the bounded buffer; also checks
    // the result is the true global minimum set
    val df = (1 to 10000).map(i => ((i * 7919) % 10007).toLong).toDF("v")
      .repartition(8)
    val got = df.agg(minK(col("v"), 5, distinct = true).as("a"))
      .as[Seq[Long]].head()
    val want = (1 to 10000).map(i => ((i * 7919) % 10007).toLong)
      .distinct.sorted.take(5)
    assert(got == want)
  }
}
