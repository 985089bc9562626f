package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query set
  * against a full scan of the corpus (linear, embarrassingly parallel; the
  * right choice when the query set is small).
  *
  * Scale path: IVF — a coarse quantizer assigns every vector to a cluster;
  * queries probe only their own cluster(s), cutting the scanned fraction to
  * ~1/nlist. Here the cluster id is a provided column (the `label` of the
  * embeddings table plays the role of the quantizer assignment); at 100 TB
  * the corpus would also be physically partitioned by cluster so a probe
  * prunes parquet partitions instead of scanning them.
  *
  * All arithmetic is double-precision left-to-right folds (deterministic,
  * engine-exact).
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-match excluded), deterministic tie-break on neighbor id.
    * `queries` and `corpus` need (idCol, vecCol). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF-style probe: restrict the scan to the query's own cluster
    * (`clusterCol` = coarse-quantizer assignment). Same output contract as
    * [[bruteForceTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, clusterCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(clusterCol).as("qc"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(clusterCol).as("cc"))
    val scored = c.join(broadcast(q), col("qc") === col("cc"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** Random-hyperplane LSH bucketing: `numBits` sign-projections against
    * deterministic ±1 hyperplanes (seeded), giving a bucket id; near
    * neighbors collide with high probability. Candidates are then scored
    * exactly within buckets — the scan cost drops to the bucket size. */
  /** Deterministic ±1 hyperplanes for [[lshTopK]] — also consumed by the
    * oracle-SQL generator so both engines project against the same planes. */
  def hyperplanes(dim: Int, numBits: Int, seed: Long): Seq[Seq[Int]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Seq.fill(dim)(if (rnd.nextBoolean()) 1 else -1))
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, dim: Int, numBits: Int, k: Int,
              seed: Long = 42L): DataFrame = {
    // hyperplane p = vector of ±1; bucket bit p = sign(dot(v, plane))
    val planes: Seq[Seq[Int]] = hyperplanes(dim, numBits, seed)
    def bucket(vec: Column): Column = {
      val bits = planes.zipWithIndex.map { case (plane, bi) =>
        val proj = aggregate(
          zip_with(vec, typedlit(plane), (x, s) => x.cast("double") * s.cast("double")),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, lit(1L) * lit(1L << bi)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", bucket(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", bucket(col("cv")))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }
}
