package graft

import graft.operators.{Dedup, Sampling, TextOps}
import org.apache.spark.sql.functions._

/** Second selection batch (q136-q139 family): temperature reweighting,
  * distribution matching, span-level contamination, leakage-safe split. */
class CurationSelectSpec extends SparkSpec {
  import spark.implicits._

  test("temperedAllocate flattens the mix but keeps the budget") {
    // weights 900 / 100 (W=1000, B=500): proportional gives 450/50;
    // isqrt weights 30/10 give 375/125 — the small stratum gains
    val docs = (1L to 9L).map(i => ("big", i, 100L)) :+ (("small", 10L, 100L))
    val df = docs.toDF("src", "doc_id", "n_tokens")
    val out = Sampling.temperedAllocate(df, "src", "doc_id", "n_tokens", 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("big") + out("small") == 500L)
    assert(out("big") == 375L && out("small") == 125L)
    val prop = Sampling.budgetAllocate(df, "src", "doc_id", "n_tokens", 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prop("small") == 50L && out("small") > prop("small"))
  }

  test("matchDistribution takes min(ref, avail) per bucket, hash-ordered") {
    val ref = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("doc_id", "b") // 2 / 1
    val cand = Seq((10L, 0L), (11L, 1L), (12L, 1L), (13L, 2L))
      .toDF("doc_id", "b") // 1 / 2 / 1
    val out = Sampling.matchDistribution(ref, cand, "b", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 1L, 1L))) // shortfall reported, not borrowed
    assert(out(1L) == ((1L, 2L, 1L))) // capped at ref count
    assert(out(2L) == ((0L, 1L, 0L))) // bucket absent from ref selects 0
    // determinism: same selection under repartitioning
    val again = Sampling.matchDistribution(ref, cand.repartition(7), "b", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out.map { case (k, v) => k -> v._3 })
  }

  test("contamSpanCoverage unions overlapping spans and clamps short docs") {
    val docs = Seq(
      // train doc provides the 3-gram corpus
      (1L, "a b c d e f g h", "train"),
      // test doc shares windows at pos 0 ("a b c") and pos 1 ("b c d"):
      // union of [0,3)+[1,4) = 4 tokens of 6
      (2L, "a b c d x y", "test"),
      // disjoint hits: "a b c" at 0, "f g h" at 4 -> 6 of 7
      (3L, "a b c q f g h", "test"),
      // no shared 3-gram
      (4L, "p q r s", "test"),
      // short docs (< n tokens): the single short window only matches
      // another short window with the same text; clamp caps raw 3 at 2
      (5L, "a b", "test"),
      (6L, "a b", "train")
    ).toDF("doc_id", "text", "split")
    val out = TextOps.contamSpanCoverage(docs, "doc_id", "text", "split",
        "train", "test", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(2L) == ((6L, 4L, 666666L)))
    assert(out(3L) == ((7L, 6L, 857142L)))
    assert(out(4L) == ((4L, 0L, 0L)))
    assert(out(5L)._1 == 2L && out(5L)._2 == 2L) // clamped, not 3
    assert(!out.contains(1L)) // train docs are not scored
  }

  test("groupSafeSplit: every member inherits its group's label") {
    val corpus = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain pairs: {1..5} one component, {10,11} another
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.groupSafeSplit(corpus, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 17L)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 40)
    // a group never straddles splits
    val perGroup = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perGroup.values.forall(_.size == 1))
    val bySplit = rows.groupBy(_._3)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // the component members share the label of group 1
    val g1 = rows.filter(r => Set(1L, 2L, 3L, 4L, 5L).contains(r._1))
    assert(g1.map(_._3).toSet.size == 1 && g1.map(_._2).toSet == Set(1L))
  }
}
