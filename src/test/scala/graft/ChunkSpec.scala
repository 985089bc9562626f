package graft

import graft.operators.TextOps

/** Sliding-window chunking edge cases. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("windows overlap by chunkSize - stride; short docs yield one chunk") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c")).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),   // overlap of 1 token
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (1L, 3L, 1L, "t10"),           // trailing partial window
      (2L, 0L, 3L, "a b c")))
  }

  test("exact multiple of stride emits no empty trailing chunk") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text") // 6 tokens
    val got = TextOps.chunkTokens(df, "doc_id", "text", chunkSize = 3, stride = 3)
      .orderBy("chunk_id").collect().map(r => (r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq((0L, "a b c"), (1L, "d e f")))
  }
}
