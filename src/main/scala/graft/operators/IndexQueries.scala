package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Indexing / sketching / range-join gates (q74-q77): the operators a
  * retrieval-and-curation stack layers on top of the core engine —
  * postings-list construction, interval joins planned as equi-joins,
  * mergeable KMV distinct sketches, and deterministic per-stratum
  * sampling. All four ride [[graft.plans.BoundedMinKAgg]] or
  * [[RangeJoin]], the two scale-bearing primitives added for them.
  */
object IndexQueries {

  /** Knuth multiplicative hash, mod 2^32 — ONE definition for every
    * bit-replayed gate (q76/q77 here, q84/q106 in [[Layout]]); a private
    * copy would let the two silently diverge and break the cross-gate
    * replay contract. See [[Layout.knuthHash]] for the overflow-safe
    * closed form. */
  private def knuthHash(key: Column): Column = Layout.knuthHash(key)

  private def minK(entry: Column, k: Int, distinct: Boolean): Column =
    GraftColumnBridge.column(
      graft.plans.BoundedMinKAgg(GraftColumnBridge.expression(entry), k, distinct)
        .toAggregateExpression())

  /** q74: inverted-index construction — per token: document frequency,
    * total term frequency, and the head of the postings list (top-3 docs
    * by tf desc, doc_id asc). The top-k is a [[graft.plans.BoundedMinKAgg]]
    * over `struct(-tf, doc_id)`: map-side partial aggregation keeps ≤ 3
    * entries per token per task, so stopword-grade hot tokens cost a
    * bounded buffer instead of the full-partition sort a window
    * `row_number` would pay. Top-30 tokens by df keep the gate small. */
  def q74Postings(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val entry = struct((-col("tf")).as("ntf"), col("doc_id").as("doc_id"))
    tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
        minK(entry, 3, distinct = false).as("top"))
      .select(col("token"), col("df"), col("total_tf"),
        concat_ws(",",
          transform(col("top"), e => e.getField("doc_id").cast("string")))
          .as("postings"))
      .orderBy(col("df").desc, col("token"))
      .limit(30)
  }

  /** q75: interval join as an equi-join — lineitems shipped inside the
    * 7-day window after each (filtered) urgent order's date, via
    * [[RangeJoin.intervalJoin]] day-binning. The exact predicate is
    * re-applied post-join; the plan contains NO nested-loop join
    * (PlanAudit asserts this), which is what makes the shape survive a
    * 100× scale-up. */
  def q75RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 32 === 0)
      .select(col("o_orderkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("start_d"))
      .withColumn("end_d", col("start_d") + 7)
    val pts = Tables.lineitem(spark, dir)
      .select(col("l_quantity"),
        unix_date(to_date(col("l_shipdate"))).cast("long").as("ship_d"))
    RangeJoin.intervalJoin(pts, "ship_d", iv, "start_d", "end_d", binWidth = 7L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"),
        sum(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** q76: KMV (k-minimum-values) distinct sketch per group — the k
    * smallest distinct hash values of the key; estimate
    * `(k-1) · 2^32 / h_k`, exact when the group holds fewer than k
    * distinct hashes (sparse mode). The sketch is a bounded mergeable
    * aggregation buffer — the scale path for distinct-count over
    * arbitrarily hot groups, storable and unionable across loads (merge
    * two sketches = merge arrays, resort, trim). The exact
    * `count(distinct)` is emitted alongside for the gate. Both engines
    * compute the estimate with the same IEEE double division, so it is
    * hash-exact. */
  def q76KmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 16
    val h = knuthHash(col("o_custkey"))
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"),
        minK(h, k, distinct = true).as("kmv"))
      .select(col("o_orderpriority"), col("exact_distinct"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            element_at(col("kmv"), k).cast("double"))
          .as("kmv_est"))
      .orderBy(col("o_orderpriority"))
  }

  /** q77: deterministic fixed-size sample per stratum — the 10 docs with
    * the smallest Knuth hash per language. Hash-ordered selection makes
    * the sample stable under partitioning, insertion order, and reruns
    * (DeterminismSpec property), and the bounded aggregate keeps ≤ 10
    * rows per stratum per task — no full-stratum window sort, no
    * reservoir state. */
  def q77StratSample(spark: SparkSession, dir: String): DataFrame = {
    val entry = struct(knuthHash(col("doc_id")).as("h"), col("doc_id").as("doc_id"))
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(minK(entry, 10, distinct = false).as("picks"))
      .select(col("lang"), posexplode(col("picks")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("e").getField("doc_id").as("doc_id"))
      .orderBy(col("lang"), col("rank"))
  }

  /** q78: single-pass histogram quantile sketch — p50/p95/p99 of
    * `l_extendedprice` per return flag via [[OrderStats.histQuantiles]]
    * (256 bins over [0, 110000]). Bounded per-group state, mergeable
    * across loads; the oracle replays the identical IEEE bin arithmetic
    * in SQL, so even the ESTIMATE is hash-exact. */
  def q78HistQuantile(spark: SparkSession, dir: String): DataFrame =
    OrderStats.histQuantiles(Tables.lineitem(spark, dir),
        Seq("l_returnflag"), "l_extendedprice", 0.0, 110000.0, 256,
        Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99)))
      .orderBy(col("l_returnflag"))

  /** q79: Morton z-values over (custkey, order day) — the clustering key
    * behind [[Layout.storeZOrdered]] multi-column data skipping. The
    * oracle replays the 32-term bit interleave in SQL, verifying the
    * expression the layout sorts by is exactly the curve it claims. */
  def q79Zorder(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        Layout.zValue(Seq(col("o_custkey"),
          unix_date(to_date(col("o_orderdate"))).cast("long")), 16).as("zval"))
      .orderBy(col("o_orderkey"))

  /** q80: blocked fuzzy join over document text — prefix blocking +
    * levenshtein verification ([[Dedup.blockedFuzzyPairs]]), the
    * edit-distance flavor of near-dup pairing alongside the
    * Jaccard/MinHash/SimHash family. */
  def q80FuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    Dedup.blockedFuzzyPairs(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("a_id"), col("b_id"))

  /** q144: positional phrase search — the corpus's most frequent token
    * trigram ([[Retrieval.topTrigram]], self-contained phrase pick) run
    * through the windowed [[Retrieval.phraseSearch]]; no positional
    * self-join anywhere. */
  def q144PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val phrase = Retrieval.topTrigram(docs, "doc_id", "text")
    Retrieval.phraseSearch(docs, "doc_id", "text", phrase)
      .withColumn("phrase", lit(phrase.mkString(" ")))
      .orderBy(col("doc_id"))
  }

  /** q158: HLL-style register sketch per order priority
    * ([[Sketches.hllSketch]], 64 registers, integer rank ladder +
    * rational harmonic sum) alongside the exact distinct — the
    * fixed-memory mergeable companion of q76's KMV. */
  def q158HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val sk = Sketches.hllSketch(ord, Seq("o_orderpriority"), "o_custkey")
    val ex = ord.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).cast("long").as("exact_distinct"))
    ex.join(sk, "o_orderpriority").orderBy(col("o_orderpriority"))
  }

  /** q159: interval-OVERLAP join ([[RangeJoin.overlapJoin]]) — urgent
    * orders' 7-day windows × high-priority orders' 5-day windows, with
    * the exact overlap length; binned equi-join with the emit-once
    * first-shared-bin guard, never a nested loop. */
  def q159OverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderkey") % 16 === 0)
      .select(col("o_orderkey").as("a_key"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("a_start"))
      .withColumn("a_end", col("a_start") + 7)
    val b = o.filter(col("o_orderpriority") === "2-HIGH" &&
        col("o_orderkey") % 16 === 0)
      .select(col("o_orderkey").as("b_key"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("b_start"))
      .withColumn("b_end", col("b_start") + 5)
    // the gate's corpus is a bounded slice (orderkey % 16); the unkeyed
    // quadratic output is the documented finding q166 mitigates
    RangeJoin.overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end",
        binWidth = 7L, allowUnkeyed = true)
      .select(col("a_key"), col("b_key"),
        (least(col("a_end"), col("b_end"))
          - greatest(col("a_start"), col("b_start"))).as("overlap_days"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** q166: KEYED interval-overlap join ([[RangeJoin.overlapJoinKeyed]])
    * — the q159 shape bounded by a tenant key (custkey mod 64), the
    * documented mitigation for density-driven pair growth. */
  def q166KeyedOverlap(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey").as("a_key"),
        pmod(col("o_custkey"), lit(64L)).as("a_ten"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("a_start"))
      .withColumn("a_end", col("a_start") + 7)
    val b = o.filter(col("o_orderpriority") === "2-HIGH" &&
        col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey").as("b_key"),
        pmod(col("o_custkey"), lit(64L)).as("b_ten"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("b_start"))
      .withColumn("b_end", col("b_start") + 5)
    RangeJoin.overlapJoinKeyed(a, "a_ten", "a_start", "a_end",
        b, "b_ten", "b_start", "b_end", binWidth = 7L)
      .select(col("a_ten").as("tenant"), col("a_key"), col("b_key"),
        (least(col("a_end"), col("b_end"))
          - greatest(col("a_start"), col("b_start"))).as("overlap_days"))
      .orderBy(col("tenant"), col("a_key"), col("b_key"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_phrase_search" -> q144PhraseSearch _,
    "q158_hll_distinct"  -> q158HllDistinct _,
    "q159_overlap_join"  -> q159OverlapJoin _,
    "q166_keyed_overlap" -> q166KeyedOverlap _,
    "q74_postings"    -> q74Postings _,
    "q75_range_join"  -> q75RangeJoin _,
    "q76_kmv_distinct" -> q76KmvDistinct _,
    "q77_strat_sample" -> q77StratSample _,
    "q78_hist_quantile" -> q78HistQuantile _,
    "q79_zorder"       -> q79Zorder _,
    "q80_fuzzy_join"   -> q80FuzzyJoin _,
  )

  /** The q79 oracle's 32 interleave terms, generated so the SQL provably
    * mirrors [[Layout.zValue]]'s bit placement (bit i of column c →
    * position i*ncols + c). */
  private def zOrderSqlTerms: String = {
    val cols = Seq("x", "y")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until 16
    } yield s"((($c >> $i) & 1) << ${i * cols.size + ci})"
    terms.mkString(" | ")
  }

  val oracles: Map[String, String] = Map(
    // the q159 replay with the tenant-equality bound
    "q166_keyed_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key, o_custkey % 64 AS ten,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS BIGINT) AS s
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 4 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key, o_custkey % 64 AS ten,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS BIGINT) AS s
        |  FROM orders
        |  WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 4 = 0)
        |SELECT CAST(a.ten AS BIGINT) AS tenant, a.a_key, b.b_key,
        |  CAST(least(a.s + 7, b.s + 5) - greatest(a.s, b.s) AS BIGINT)
        |    AS overlap_days
        |FROM a JOIN b ON a.ten = b.ten AND a.s < b.s + 5 AND b.s < a.s + 7
        |ORDER BY tenant, a_key, b_key""".stripMargin,
    // a direct theta join replays the binned equi-join + emit-once plan
    "q159_overlap_join" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS BIGINT) AS s
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 16 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS BIGINT) AS s
        |  FROM orders
        |  WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 16 = 0)
        |SELECT a.a_key, b.b_key,
        |  CAST(least(a.s + 7, b.s + 5) - greatest(a.s, b.s) AS BIGINT)
        |    AS overlap_days
        |FROM a JOIN b ON a.s < b.s + 5 AND b.s < a.s + 7
        |ORDER BY a_key, b_key""".stripMargin,
    // knuth hash -> register/rank split -> 26-branch integer ladder ->
    // per-register max -> exact integer harmonic numerator; the only
    // float op is the final alpha*m^2*2^27 divide (power-of-two scales,
    // association-free)
    "q158_hll_distinct" ->
      s"""WITH h AS (
        |  SELECT o_orderpriority,
        |    ((o_custkey % 2147483647) * 2654435761) % 4294967296 AS h
        |  FROM orders),
        |jr AS (
        |  SELECT o_orderpriority, h // 67108864 AS j, h % 67108864 AS r
        |  FROM h),
        |rho AS (
        |  SELECT o_orderpriority, j, ${Sketches.hllRhoSql("r")} AS rho
        |  FROM jr),
        |regs AS (
        |  SELECT o_orderpriority, j, max(rho) AS mj
        |  FROM rho GROUP BY o_orderpriority, j),
        |agg AS (
        |  SELECT o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n_registers_set,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(27 - mj AS INTEGER))
        |         AS BIGINT) AS s
        |  FROM regs GROUP BY o_orderpriority),
        |ex AS (
        |  SELECT o_orderpriority,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT ex.o_orderpriority, ex.exact_distinct, agg.n_registers_set,
        |  CAST(agg.s + (64 - agg.n_registers_set) * 134217728 AS BIGINT)
        |    AS hll_num,
        |  CAST(0.709 AS DOUBLE) * 4096.0 * 134217728.0
        |    / CAST(agg.s + (64 - agg.n_registers_set) * 134217728 AS DOUBLE)
        |    AS hll_est
        |FROM ex JOIN agg USING (o_orderpriority)
        |ORDER BY ex.o_orderpriority""".stripMargin,
    // slice-based trigrams == the engine's lead() windows (0-based pos);
    // top pick and match count replayed with the same tie order
    "q144_phrase_search" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |tri AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    toks[CAST(i AS INTEGER)+1] AS w0,
        |    toks[CAST(i AS INTEGER)+2] AS w1,
        |    toks[CAST(i AS INTEGER)+3] AS w2
        |  FROM base, unnest(generate_series(0, len(toks) - 3)) AS u(i)
        |  WHERE len(toks) >= 3),
        |top AS (
        |  SELECT w0, w1, w2 FROM (
        |    SELECT w0, w1, w2, count(*) AS n FROM tri
        |    GROUP BY w0, w1, w2
        |    ORDER BY n DESC, w0, w1, w2 LIMIT 1) t)
        |SELECT tri.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        |  CAST(min(tri.pos) AS BIGINT) AS first_pos,
        |  (SELECT w0 || ' ' || w1 || ' ' || w2 FROM top) AS phrase
        |FROM tri JOIN top
        |  ON tri.w0 = top.w0 AND tri.w1 = top.w1 AND tri.w2 = top.w2
        |GROUP BY tri.doc_id
        |ORDER BY tri.doc_id""".stripMargin,
    "q74_postings" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY token, doc_id),
        |ranked AS (
        |  SELECT token, doc_id, tf,
        |    row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rn
        |  FROM tf),
        |agg AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        |  FROM tf GROUP BY token),
        |post AS (
        |  SELECT token,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY tf DESC, doc_id) AS postings
        |  FROM ranked WHERE rn <= 3 GROUP BY token)
        |SELECT a.token, a.df, a.total_tf, p.postings
        |FROM agg a JOIN post p USING (token)
        |ORDER BY a.df DESC, a.token
        |LIMIT 30""".stripMargin,
    "q75_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 32 = 0)
        |SELECT iv.o_orderkey,
        |  CAST(count(*) AS BIGINT) AS n_shipped,
        |  CAST(sum(l.l_quantity) AS DOUBLE) AS sum_qty
        |FROM iv JOIN lineitem l
        |  ON CAST(l.l_shipdate AS DATE) >= iv.d0
        | AND CAST(l.l_shipdate AS DATE) < iv.d0 + INTERVAL 7 DAY
        |GROUP BY iv.o_orderkey
        |ORDER BY iv.o_orderkey""".stripMargin,
    "q76_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT o_orderpriority,
        |    ((o_custkey % 2147483647) * 2654435761) % 4294967296 AS h
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, h,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
        |  FROM h),
        |k AS (
        |  SELECT o_orderpriority,
        |    max(CASE WHEN rn = 16 THEN h END) AS h16,
        |    count(*) AS nh
        |  FROM r GROUP BY o_orderpriority),
        |ex AS (
        |  SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT ex.o_orderpriority, ex.exact_distinct,
        |  CASE WHEN k.h16 IS NULL THEN CAST(k.nh AS DOUBLE)
        |       ELSE 64424509440.0 / CAST(k.h16 AS DOUBLE) END AS kmv_est
        |FROM ex JOIN k USING (o_orderpriority)
        |ORDER BY ex.o_orderpriority""".stripMargin,
    "q77_strat_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id, ((doc_id % 2147483647) * 2654435761) % 4294967296 AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
        |  FROM h)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
        |FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,
    "q78_hist_quantile" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(least(greatest(floor(
        |      (CAST(l_extendedprice AS DOUBLE) - 0.0) * 256.0 / 110000.0),
        |      0.0), 255.0) AS BIGINT) AS bin
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, bin, count(*) AS c FROM b GROUP BY 1, 2),
        |cc AS (
        |  SELECT l_returnflag, bin,
        |    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin) AS DOUBLE) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS tot
        |  FROM c)
        |SELECT l_returnflag,
        |  min(CASE WHEN cum >= 0.5 * tot
        |      THEN 0.0 + CAST(bin + 1 AS DOUBLE) * 110000.0 / 256.0 END) AS p50,
        |  min(CASE WHEN cum >= 0.95 * tot
        |      THEN 0.0 + CAST(bin + 1 AS DOUBLE) * 110000.0 / 256.0 END) AS p95,
        |  min(CASE WHEN cum >= 0.99 * tot
        |      THEN 0.0 + CAST(bin + 1 AS DOUBLE) * 110000.0 / 256.0 END) AS p99
        |FROM cc
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q79_zorder" ->
      s"""WITH c AS (
        |  SELECT o_orderkey,
        |    least(greatest(o_custkey, 0), 65535) AS x,
        |    least(greatest(CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT), 0), 65535) AS y
        |  FROM orders)
        |SELECT o_orderkey, CAST($zOrderSqlTerms AS BIGINT) AS zval
        |FROM c
        |ORDER BY o_orderkey""".stripMargin,
    "q80_fuzzy_join" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |b AS (SELECT id, norm[1:16] AS blk, norm[1:60] AS cmp FROM t)
        |SELECT a.id AS a_id, b2.id AS b_id,
        |  CAST(levenshtein(a.cmp, b2.cmp) AS BIGINT) AS dist
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.id < b2.id
        |WHERE levenshtein(a.cmp, b2.cmp) <= 10
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
