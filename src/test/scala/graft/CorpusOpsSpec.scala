package graft

import graft.operators.{Events, Profile, TextOps}
import org.apache.spark.sql.functions._

/** Round-8 corpus-statistics operators: duplicated-span detection,
  * collocations, BPE pair stats, dyadic EWMA, median/MAD outliers —
  * hand-computed fixtures, exact expected values. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("spanDedup flags cross-doc spans, not unique or within-doc text") {
    val boiler = "this license text is identical boilerplate across docs yes"
    val docs = Seq(
      (1L, s"alpha unique content one $boiler"),
      (2L, s"totally different beginning here $boiler"),
      (3L, "no shared spans at all in this document body of words which " +
        "rambles on long enough to emit several windows of its own kind"),
    ).toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, "doc_id", "text", k = 40)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // docs 1 and 2 share the boilerplate tail → at least one dup window each
    assert(byId(1L).getLong(2) >= 1, "doc 1 should have dup windows")
    assert(byId(2L).getLong(2) >= 1, "doc 2 should have dup windows")
    assert(byId(3L).getLong(2) == 0, "doc 3 is unique")
    // ppm = floor(1e6 * dup / windows)
    val r1 = byId(1L)
    assert(r1.getLong(3) == 1000000L * r1.getLong(2) / r1.getLong(1))
  }

  test("spanDedup drops docs shorter than one window") {
    val docs = Seq((1L, "short"), (2L, "a" * 60)).toDF("doc_id", "text")
    val ids = TextOps.spanDedup(docs, "doc_id", "text", 40)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }

  test("collocations surfaces the only pair above minCount, exact lift") {
    // "fort knox" always adjacent; every other adjacency is unique per doc
    val docs = (1 to 30).map(i =>
      (i.toLong, s"word$i fort knox note$i end$i")).toDF("doc_id", "text")
    val out = TextOps.collocations(docs, "text", minCount = 5, topN = 5)
      .collect()
    assert(out.length == 1)
    val top = out.head
    assert((top.getString(0), top.getString(1)) == ("fort", "knox"))
    // c_xy=30, c_x=c_y=30, N=150 → lift_ppm = 1e6*30*150/(30*30) = 5_000_000
    assert(top.getLong(2) == 30L && top.getLong(3) == 5000000L)
  }

  test("bpePairStats weights pairs by word frequency") {
    val docs = Seq((1L, "aba aba aba cd"), (2L, "aba cd cd")).toDF("doc_id", "text")
    val out = TextOps.bpePairStats(docs, "text", topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocab: aba freq 4 (pairs ab, ba), cd freq 3 (pair cd)
    assert(out == Map("ab" -> 4L, "ba" -> 4L, "cd" -> 3L))
  }

  test("ewmaRecent computes the dyadic weighted average, newest heaviest") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts.getTime + s * 1000L)
    val ev = Seq(
      (1L, t(1), 10L, 1.0),   // oldest
      (1L, t(2), 11L, 2.0),
      (1L, t(3), 12L, 4.0),   // newest
      (2L, t(1), 20L, 7.5),
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Events.ewmaRecent(ev, "user_id", "ts", "event_id", "value", k = 3)
      .orderBy("user_id").collect()
    // user 1: milli values newest-first (4000,2000,1000), weights (4,2,1)
    //   → (16000+4000+1000) div 7 = 3000
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 3000L)
    // user 2: single event → its own value
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 7500L)
  }

  test("ewmaRecent keeps only the newest k events") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts.getTime + s * 1000L)
    val ev = (1 to 20).map(i => (1L, t(i), i.toLong, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Events.ewmaRecent(ev, "user_id", "ts", "event_id", "value", k = 4)
      .collect()
    assert(out(0).getLong(1) == 4L)      // capped at k
    assert(out(0).getLong(2) == 1000L)   // constant series → its value
  }

  test("bpeTrain learns and APPLIES merges round by round") {
    val docs = Seq((1L, "aaab"), (2L, "aaab"), (3L, "aaab")).toDF("doc_id", "text")
    val out = TextOps.bpeTrain(docs, "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) 6 beats (a,b) 3; merged "a a a b " -> "aa a b "
    // round 2: (aa,a) 3 ties (a,b) 3 -> pair order picks (a,b) -> "aa ab "
    // round 3: only (aa,ab) 3 remains
    assert(out.toSeq == Seq((1L, "a", "a", 6L), (2L, "a", "b", 3L),
      (3L, "aa", "ab", 3L)))
  }

  test("spanDupRuns measures consecutive shared windows, 0 for unique") {
    val boiler = "license text which is identical across both documents " +
      "and long enough to span several anchored windows in a row yes truly"
    val docs = Seq(
      (1L, s"first document unique opening here $boiler"),
      (2L, s"second one starts differently $boiler"),
      (3L, "entirely unique content with no shared spans anywhere in this " +
        "body which still has to be long enough to emit some windows"),
    ).toDF("doc_id", "text")
    val out = TextOps.spanDupRuns(docs, "doc_id", "text", k = 40)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3L) == 0L)
    assert(out(1L) == out(2L) && out(1L) >= 2L,
      s"shared tail should give an equal multi-window run, got $out")
  }

  test("bpe merge respects symbol boundaries (no string-replace shortcut)") {
    // round 1 learns (a,b); round 2 learns (b,c). The word "abc" is then
    // (ab, c) — its "b" lives INSIDE the merged symbol, so merge 2 must
    // NOT touch it. A replace("b c ", "bc ") formulation would corrupt
    // it to one token.
    val docs = (
      (1 to 5).map(i => (i.toLong, "ab")) ++
      (6 to 9).map(i => (i.toLong, "bc")) ++
      Seq((10L, "abc"))
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 2's (b,c) counts only the 4 "bc" words: "abc"'s b was
    // consumed by the round-1 (a,b) merge
    assert(merges.toSeq == Seq((1L, "a", "b", 6L), (2L, "b", "c", 4L)))
    val toks = TextOps.bpeApply(docs, "doc_id", "text",
        merges.map(m => (m._2, m._3)).toSeq)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(toks(1L) == 1L && toks(6L) == 1L)
    assert(toks(10L) == 2L, "abc must tokenize as (ab, c), not collapse")
  }

  test("bpe merge handles overlapping same-symbol chains leftmost-greedy") {
    // merging (a,a) on "aaaa" must give (aa, aa) and on "aaa" (aa, a)
    val docs = Seq((1L, "aaaa"), (2L, "aaa")).toDF("doc_id", "text")
    val toks = TextOps.bpeApply(docs, "doc_id", "text", Seq(("a", "a")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(toks == Map(1L -> 2L, 2L -> 2L))
  }

  test("madOutliers finds the robust center and the planted outlier") {
    val rows = Seq.fill(9)(("a", 10.0)) ++ Seq(("a", 500.0)) ++
      (1 to 5).map(i => ("b", i.toDouble))
    val out = Profile.madOutliers(rows.toDF("g", "value"), "g", "value", k = 3)
      .orderBy("g").collect()
    val a = out(0)
    // group a: median 10000 milli, MAD 0, single 500.0 outlier
    assert(a.getLong(1) == 10L && a.getDouble(2) == 10000.0)
    assert(a.getDouble(3) == 0.0 && a.getLong(4) == 1L)
    val b = out(1)
    // group b: 1..5 → median 3000, deviations (2000,1000,0,1000,2000) → MAD 1000
    assert(b.getDouble(2) == 3000.0 && b.getDouble(3) == 1000.0)
    assert(b.getLong(4) == 0L)
  }
}
