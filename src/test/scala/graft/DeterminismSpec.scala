package graft

import graft.operators.{Sampling, TextOps}
import org.apache.spark.sql.functions._

/** Partitioning-invariance: the engine's determinism discipline claims
  * results are bit-identical under ANY physical layout (that is what lets
  * a 32-thread bench, a 4-thread verify run, and a DuckDB oracle agree).
  * These cases re-run representative operators under different
  * repartitionings and require identical results. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (1 to n)
    .map(i => (i.toLong, s"lang${i % 3}", s"the quick doc $i with words " * (i % 4 + 1)))
    .toDF("doc_id", "lang", "text")

  test("key-hash sampling and splits are layout-independent") {
    val base = docs(200)
    def run(parts: Int) = Sampling.withSplit(
        Sampling.stratifiedQuota(base.repartition(parts), "lang", "doc_id", k = 10, seed = 7L),
        "doc_id", Seq("train" -> 0.8, "test" -> 0.2), seed = 11L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("order-canonicalized double folds are layout-independent") {
    val vecs = (1 to 100).map(i => (i.toLong, i % 5,
      Seq.tabulate(8)(d => (math.sin(i * 13 + d) * 1000).toFloat))).toDF("id", "label", "v")
    def centroids(parts: Int) = vecs.repartition(parts)
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sort_array(collect_list(col("x").cast("double"))).as("xs"))
      .select(col("label"), col("pos"),
        aggregate(col("xs"), lit(0.0), (a, b) => a + b).as("s"))
      .orderBy("label", "pos").collect().map(_.getDouble(2)).toSeq
    assert(centroids(2) == centroids(11))
  }

  test("winnowing sketches are layout-independent") {
    val base = docs(80)
    def run(parts: Int) = TextOps.winnow(base.repartition(parts), "doc_id", "text")
      .orderBy("doc_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) == run(9))
  }

  test("minhash signatures and co-occurrence lift are layout-independent") {
    import graft.operators.Dedup
    val base = docs(60)
    def sigs(parts: Int) = Dedup.minhashSignatures(
        base.repartition(parts), "doc_id", "text")
      .orderBy("doc_id", "k").collect().map(_.toSeq).toSeq
    assert(sigs(1) == sigs(7))
    def lift(parts: Int) = TextOps.cooccurLift(
        base.repartition(parts), "doc_id", "text", minPairDocs = 10)
      .orderBy("tok_a", "tok_b").collect().map(_.toSeq).toSeq
    assert(lift(1) == lift(7))
  }

  test("fluency scores and shard manifests are layout-independent") {
    import graft.operators.Layout
    val base = docs(60).withColumn("n_chars", length(col("text")))
    def flu(parts: Int) = TextOps.bigramFluency(
        base.repartition(parts), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(flu(1) == flu(7))
    def man(parts: Int) = Layout.shardManifest(base.repartition(parts),
        "doc_id", "text", "lang", "n_chars", 4)
      .collect().map(_.toSeq).toSeq
    assert(man(1) == man(7))
  }
}
