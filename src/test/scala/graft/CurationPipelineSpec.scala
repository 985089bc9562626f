package graft

import graft.pipeline.CurationPipeline
import graft.pipeline.CurationPipeline._

/** End-to-end declarative curation: each step removes exactly the doc
  * planted to trip it, and the terminal chunking emits the survivors'
  * windows. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "of")

  // doc 1: clean;  2: exact copy of 1;  3: near copy of 1 (last word
  // changed);  4: too short;  5: repetitive;  6: clean and unique
  private def corpus() = Seq(
    (1L, "the quick brown fox jumps over a lazy dog today"),
    (2L, "the quick brown fox jumps over a lazy dog today"),
    (3L, "the quick brown fox jumps over a lazy dog yesterday"),
    (4L, "zzz qqq"),
    (5L, "the spam spam spam spam spam spam spam"),
    (6L, "a small green apple fell from that old tree quickly"),
  ).toDF("doc_id", "text")

  test("each gate removes its planted doc; chunking emits survivor windows") {
    val out = CurationPipeline.run(corpus(), "doc_id", "text", Seq(
      QualityGate(stop, minTokens = 5, maxTokens = 100),
      RepetitionFilter(),
      ExactDedup,
      NearDedup(n = 5, threshold = 0.5),
      Chunk(size = 5, stride = 5)))
    val rows = out.orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // survivors 1 and 6 (10 tokens each) → two 5-token chunks apiece
    assert(rows.toSeq == Seq((1L, 0L), (1L, 1L), (6L, 0L), (6L, 1L)))
  }

  test("intermediate steps preserve doc columns; sample/split add markers") {
    val out = CurationPipeline.run(corpus(), "doc_id", "text", Seq(
      QualityGate(stop, minTokens = 5, maxTokens = 100),
      Split(Seq("train" -> 0.5, "test" -> 0.5), seed = 11L)))
    assert(out.columns.toSeq == Seq("doc_id", "text", "split"))
    assert(out.select("split").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("train", "test")))
  }

  test("decontaminate drops docs overlapping the holdout corpus") {
    // holdout shares the 12-token prefix of doc 6's pattern? craft overlap:
    // a holdout doc containing a 12-token run of doc 1 → 5 common 8-shingles
    val holdout = Seq(
      (100L, "benchmark says the quick brown fox jumps over a lazy dog today indeed"),
    ).toDF("doc_id", "text")
    val out = CurationPipeline.run(corpus(), "doc_id", "text", Seq(
      ExactDedup,
      Decontaminate(holdout, ngram = 8, minCommon = 3)))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 1 shares 3 of its 8-shingles with the holdout → dropped (doc 2
    // already collapsed into 1). Doc 3's changed last word leaves it only
    // 2 common shingles → below minCommon, kept. 4/5/6 untouched.
    assert(ids == Set(3L, 4L, 5L, 6L))
  }

  test("pipeline defined entirely by config data matches the programmatic run") {
    val conf = Map(
      "steps" -> "quality, exact_dedup, near_dedup, chunk",
      "quality.stopwords" -> "the,a,of",
      "quality.minTokens" -> "5",
      "quality.maxTokens" -> "100",
      "near_dedup.n" -> "5",
      "near_dedup.threshold" -> "0.5",
      "chunk.size" -> "5",
      "chunk.stride" -> "5")
    val steps = CurationPipeline.fromConfig(conf)
    assert(steps == Seq(
      QualityGate(stop, Nil, 5, 100), ExactDedup, NearDedup(5, 0.5), Chunk(5, 5)))
    val rows = CurationPipeline.run(corpus(), "doc_id", "text", steps)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 0L), (1L, 1L), (5L, 0L), (5L, 1L), (6L, 0L), (6L, 1L)))
  }

  test("fromConfig rejects unknown steps and decontaminate without holdout") {
    intercept[IllegalArgumentException] {
      CurationPipeline.fromConfig(Map("steps" -> "quality, frobnicate"))
    }
    intercept[IllegalArgumentException] {
      CurationPipeline.fromConfig(Map("steps" -> "decontaminate"))
    }
    // split weights parse
    val Seq(s) = CurationPipeline.fromConfig(Map(
      "steps" -> "split", "split.weights" -> "train:0.9,test:0.1", "split.seed" -> "7"))
    assert(s == Split(Seq("train" -> 0.9, "test" -> 0.1), 7L))
  }

  test("fluency gate drops gibberish; line_dedup strips boilerplate lines") {
    import org.apache.spark.sql.functions._
    // five normal-English docs train the bigram model; the gibberish doc
    // scores far below them
    val docs = Seq(
      (1L, "the cat sat on the mat near the door"),
      (2L, "the dog sat on the rug near the wall"),
      (3L, "the man ran to the car in the rain"),
      (4L, "the kid sat by the fire at the inn"),
      // gibberish built from the corpus's COMMON letters in rare orders:
      // prefix counts are high (shared with the English docs) but each
      // pair is near-unique, so per-position credits collapse
      (5L, "tn rs eo dm ac nt sr oe md ca")
    ).toDF("doc_id", "text")
    val kept = CurationPipeline.run(docs, "doc_id", "text",
        Seq(FluencyGate(minPpm = 300000.0)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(5L), s"kept: $kept")

    val withBoiler = Seq(
      (1L, "COPYRIGHT BANNER\nreal content one"),
      (2L, "COPYRIGHT BANNER\nreal content two"),
      (3L, "COPYRIGHT BANNER\nreal content three")
    ).toDF("doc_id", "text")
    val cleaned = CurationPipeline.run(withBoiler, "doc_id", "text",
        Seq(LineDedup(minDocs = 3)))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(cleaned == Seq("real content one", "real content two", "real content three"))
  }

  test("Chunk must be terminal") {
    val err = intercept[IllegalArgumentException] {
      CurationPipeline.run(corpus(), "doc_id", "text",
        Seq(Chunk(5, 5), ExactDedup))
    }
    assert(err.getMessage.contains("last step"))
  }
}
