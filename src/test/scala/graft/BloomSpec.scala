package graft

import graft.operators.{Bloom, Dedup}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination: zero false negatives by construction,
  * bit-level agreement with a reference bitmap, partitioning-invariant
  * verdicts. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val NB = 1 << 12
  private val K = 3
  private val SEED = 29L

  test("buildBitmap sets exactly the double-hash positions") {
    val grams = Seq("alpha beta", "gamma delta", "epsilon zeta").toDF("sh")
    val bitmap = Bloom.buildBitmap(grams, "sh", NB, K, SEED)
      .head().getSeq[Long](0)
    assert(bitmap.length == NB / 64)
    // reference: recompute positions via the operator's own column
    // arithmetic evaluated row-wise
    val pos = grams
      .select(explode(array(
        Bloom.positions(Dedup.polyHash(col("sh")), NB, K, SEED): _*)).as("p"))
      .collect().map(_.getLong(0)).toSet
    val setBits = bitmap.zipWithIndex.flatMap { case (w, wi) =>
      (0 until 64).filter(b => (w >> b & 1L) == 1L).map(b => wi * 64L + b)
    }.toSet
    assert(setBits == pos)
    assert(pos.size <= 9 && pos.nonEmpty)
  }

  test("no false negatives; unrelated grams mostly rejected") {
    val bench = (1 to 50).map(i => s"bench gram number $i words here").toDF("text")
    val corpus = ((1 to 50).map(i => (i.toLong, s"bench gram number $i words here")) ++
      (51 to 300).map(i => (i.toLong, s"clean document text $i nothing shared")))
      .toDF("doc_id", "text")
    val out = Bloom.decontaminate(corpus, "doc_id", "text", bench, "text",
        shingleN = 3, numBits = NB, numHashes = K, minHits = 1, seed = SEED)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // every true-overlap doc flagged (no false negatives)
    assert((1 to 50).forall(i => out(i.toLong)))
    // clean docs: overwhelmingly clean at this fill factor (fp possible
    // but must be rare — the bitmap is ~1.5% full)
    val fps = (51 to 300).count(i => out(i.toLong))
    assert(fps < 12, s"implausible false-positive count $fps")
  }

  test("verdicts are partitioning-invariant") {
    val bench = (1 to 20).map(i => s"shared snippet $i over here").toDF("text")
    val corpus = (1 to 100)
      .map(i => (i.toLong, if (i % 4 == 0) s"shared snippet ${i / 4} over here" else s"own text $i"))
      .toDF("doc_id", "text")
    def run(c: org.apache.spark.sql.DataFrame) =
      Bloom.decontaminate(c, "doc_id", "text", bench, "text",
        shingleN = 3, numBits = NB, numHashes = K, minHits = 1, seed = SEED)
        .orderBy("doc_id").collect().toSeq
    assert(run(corpus) == run(corpus.repartition(13)))
  }
}
