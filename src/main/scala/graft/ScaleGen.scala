package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for local super-linearity smokes: replicates an
  * existing sf directory `copies`× with SHIFTED KEYS (so join/group/dedup
  * cardinalities grow linearly, not quadratically) and per-copy VARIED
  * text (token rotation — byte-identical copies would make every shingle
  * posting list `copies`× hot and inflate pair counts by `copies`²,
  * measuring the data's duplicate rate instead of the engine's scaling).
  * Embedding vectors get a per-copy component rotation for the same
  * reason. TESTDATA.md tops out at sf0.1; `ScaleGen` makes the sf1 smoke
  * (BENCH sf1 section) possible without touching /root/testdata.
  *
  * Usage: `runMain graft.ScaleGen [srcDir] [outDir] [copies] [tables]` —
  * `tables` (comma list, optional) restricts generation to the tables a
  * targeted smoke needs (e.g. `lineitem,orders,documents,embeddings` for
  * the sf10 tier), so a 100× run doesn't pay for tables it won't scan.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Union `copies` copies, shifting every listed key column by
      * i·(max+1) so keys stay unique and referential joins line up
      * (all tables shift a given key by the same global stride). */
    def replicate(df: DataFrame, strides: Map[String, Long],
                  perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val shifted = strides.foldLeft(df) { case (d, (k, stride)) =>
          d.withColumn(k, col(k) + lit(stride * i))
        }
        perCopy(shifted, i)
      }.reduce(_ unionByName _)

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val lineitem = Tables.lineitem(spark, src)
    val orders = Tables.orders(spark, src)
    val customer = Tables.customer(spark, src)
    val supplier = Tables.supplier(spark, src)
    val part = Tables.part(spark, src)
    val documents = Tables.documents(spark, src)
    val embeddings = Tables.embeddings(spark, src)

    // strides are lazy so a table-filtered run (e.g. the sf10 tier) only
    // pays the max() jobs of tables it actually replicates
    lazy val okStride = stride(orders, "o_orderkey")
    lazy val ckStride = stride(customer, "c_custkey")
    lazy val skStride = stride(supplier, "s_suppkey")
    lazy val pkStride = stride(part, "p_partkey")

    // dims stay as-is (they are the broadcast side; a 10× fact scale-up
    // does not grow them in TPC-H either for nation/region)
    if (wanted("region"))
      spark.read.parquet(s"$src/region.parquet").write.mode("overwrite")
        .parquet(s"$out/region.parquet")
    if (wanted("nation"))
      spark.read.parquet(s"$src/nation.parquet").write.mode("overwrite")
        .parquet(s"$out/nation.parquet")

    if (wanted("customer"))
      write(replicate(customer, Map("c_custkey" -> ckStride)), "customer")
    if (wanted("supplier"))
      write(replicate(supplier, Map("s_suppkey" -> skStride)), "supplier")
    if (wanted("part"))
      write(replicate(part, Map("p_partkey" -> pkStride)), "part")
    if (wanted("orders"))
      write(replicate(orders,
        Map("o_orderkey" -> okStride, "o_custkey" -> ckStride)), "orders")
    if (wanted("lineitem"))
      write(replicate(lineitem,
        Map("l_orderkey" -> okStride, "l_partkey" -> pkStride,
          "l_suppkey" -> skStride)), "lineitem")

    // events: new ids/users per copy, time shifted a day per copy —
    // through Tables.events so all physical ts encodings (legacy nanos
    // long, TIMESTAMP_NTZ, session-TZ timestamp) normalize first
    if (wanted("events")) {
      val events = Tables.events(spark, src)
      val evStride = stride(events, "event_id")
      val userStride = stride(events, "user_id")
      write(replicate(events,
          Map("event_id" -> evStride, "user_id" -> userStride),
          (d, i) => d.withColumn("ts", expr(s"timestampadd(DAY, $i, ts)"))),
        "events")
    }

    // documents: every third token gets a per-copy suffix. A pure
    // rotation keeps the word multiset, so every interior shingle still
    // collides across copies and the corpus's near-dup density grows
    // ~copies× — the dedup smokes would then measure the data's
    // duplicate rate, not the engine. Tagging every third word breaks
    // all 3-word shingles between copies while keeping per-doc length
    // and vocabulary shape realistic.
    lazy val docStride = stride(documents, "doc_id")
    if (wanted("documents"))
    write(replicate(documents, Map("doc_id" -> docStride), (d, i) =>
        if (i == 0) d
        else {
          // tag PER LINE so the copy keeps the original's newline
          // structure (line-level operators — line dedup, novelty —
          // must see the same workload shape at sf1 as at sf0.1), and
          // keep NULL text NULL (concat_ws would fold it to "")
          // \s+ so tab-separated tokens still split: a literal-space
          // split would leave such lines as ONE token, interior shingles
          // byte-identical across copies, and the pair counts inflated
          // copies² — the exact failure this tagging exists to prevent.
          // Rejoining with single spaces collapses whitespace runs;
          // tokenizing operators split on \s+ anyway, so the shape the
          // smokes measure is unchanged.
          def tagLine(line: org.apache.spark.sql.Column) = {
            val toks = split(line, "\\s+")
            concat_ws(" ", zip_with(toks,
              sequence(lit(0), greatest(size(toks) - 1, lit(0))),
              (t, j) => when(j % 3 === 0 && length(t) > 0,
                concat(t, lit(s"x$i"))).otherwise(t)))
          }
          d.withColumn("text",
            when(col("text").isNull, lit(null).cast("string"))
              .otherwise(concat_ws("\n",
                transform(split(col("text"), "\n"), tagLine _))))
        }),
      "documents")

    // embeddings: rotate components by i so directions differ per copy
    lazy val vecStride = stride(embeddings, "vec_id")
    if (wanted("embeddings"))
    write(replicate(embeddings, Map("vec_id" -> vecStride), (d, i) =>
        if (i == 0) d
        else {
          val n = size(col("embedding"))
          val r = lit(i) % n
          d.withColumn("embedding",
            concat(slice(col("embedding"), r + 1, n - r),
              slice(col("embedding"), lit(1), r)))
        }),
      "embeddings")

    spark.stop()
  }
}
