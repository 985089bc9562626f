package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Cross-document line dedup: boilerplate lines (>= minDocs distinct
  * docs) vanish from every document, below-threshold and unique lines
  * survive in original order, fully-boilerplate docs stay with empty
  * text. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "HEADER\nalpha one\nFOOTER"),
    (2L, "HEADER\nbeta two\nFOOTER"),
    (3L, "HEADER\ngamma three\nshared tail"),
    (4L, "HEADER\nshared tail\ndelta four"),
    (5L, "HEADER"), // all lines boilerplate → empty text survives
  ).toDF("doc_id", "text")

  test("boilerplate threshold drops lines corpus-wide, order preserved") {
    val out = Dedup.lineDedup(corpus, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // HEADER in 5 docs → dropped; FOOTER in 2, "shared tail" in 2 → kept
    assert(out.toSeq == Seq(
      (1L, "alpha one\nFOOTER", 2L, 3L),
      (2L, "beta two\nFOOTER", 2L, 3L),
      (3L, "gamma three\nshared tail", 2L, 3L),
      (4L, "shared tail\ndelta four", 2L, 3L),
      (5L, "", 0L, 1L)))
  }

  test("threshold is on distinct docs, not occurrences") {
    // "dup line" appears twice in ONE doc: 1 distinct doc < 2 → kept
    val df = Seq((1L, "dup line\nmid\ndup line"), (2L, "other")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("dup line\nmid\ndup line", "other"))
  }

  test("results are partitioning-invariant") {
    val a = Dedup.lineDedup(corpus, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.lineDedup(corpus.repartition(7), "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("minDocs below 2 is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.lineDedup(corpus, "doc_id", "text", minDocs = 1)
    }
  }
}
