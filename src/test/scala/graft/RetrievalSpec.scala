package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Rational-idf BM25: hand-computed scores, deterministic ranking,
  * partitioning invariance. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: apple ×2 of 4 tokens; doc 2: apple ×1 of 2; doc 3: none
  private val corpus = Seq(
    (1L, "apple pie apple crumble"),
    (2L, "apple cider"),
    (3L, "banana split only")).toDF("doc_id", "text")
  private val query = Seq((100L, "apple")).toDF("query_id", "term")

  private def expected(tf: Long, df: Long, dl: Long, nDocs: Long,
                       avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5)
    idf * ((tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl))))
  }

  test("single-term scores match the closed-form computation exactly") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", query,
        "query_id", "term", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(4)))
    val avgdl = 9.0 / 3.0 // 4 + 2 + 3 tokens over 3 docs
    // df(apple) = 2; doc 1's tf=2 outweighs doc 2's shorter length here
    val e1 = expected(tf = 2, df = 2, dl = 4, nDocs = 3, avgdl = avgdl)
    val e2 = expected(tf = 1, df = 2, dl = 2, nDocs = 3, avgdl = avgdl)
    assert(out.toSeq == Seq((1L, e1, 1L), (2L, e2, 2L)))
    assert(e1 > e2)
  }

  test("multi-term scores fold in canonical order; ties break on doc_id") {
    val q2 = Seq((1L, "apple"), (1L, "split"), (2L, "banana")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", q2,
        "query_id", "term", k = 10)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // query 1 matches docs 1,2 (apple) and 3 (split — df=1, so its high
    // idf outranks both apple matches); query 2 matches doc 3
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 3L), (1L, 1L), (1L, 2L), (2L, 3L)))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(1L, 1L, 1L)) // n_terms
  }

  test("results are partitioning-invariant (bit-exact scores)") {
    val q2 = Seq((1L, "apple"), (1L, "pie"), (1L, "only")).toDF("query_id", "term")
    def run(c: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(c, "doc_id", "text", q2, "query_id", "term", k = 10)
        .orderBy("rank").collect().toSeq
    assert(run(corpus) == run(corpus.repartition(7)))
  }
}
