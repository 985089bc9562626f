package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second relational battery: the SQL passthrough surface (W3 — the
  * reference delegates exactly this to its DBMS), the as-of join extension,
  * grouping sets, exact percentiles, string functions, calendar rollups,
  * outer-join semantics. */
object ExtendedQueries {

  /** The reference's DBMS-delegation surface: user-supplied SQL text over
    * registered views (`$DB->{query}` passthrough, `Wrap/DB.pm:73`). */
  def q31SqlPassthrough(spark: SparkSession, dir: String): DataFrame = {
    Seq("region", "nation", "customer", "orders")
      .foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, year(o_orderdate)
        |ORDER BY r_name, yr""".stripMargin)
  }

  /** As-of join: each click event matched with the user's most recent
    * error event at-or-before it. */
  def q32AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("value").as("err_value"))
    AsOfJoin.asof(clicks, errors, Seq("user_id"), "ts", "ts", Seq("err_value"))
      .select(col("event_id"), col("user_id"), col("asof_err_value").as("err_value"))
      .orderBy(col("event_id"))
  }

  /** GROUPING SETS with sentinel labels. */
  def q33GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT coalesce(l_returnflag, '_ALL_') AS returnflag,
        |  coalesce(l_linestatus, '_ALL_') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Exact interpolated percentiles (order statistics — deterministic).
    * Uses [[OrderStats.exactPercentiles]] rather than Spark's `percentile`
    * aggregate: same values, but rank-based two-pass instead of an
    * all-values-per-group aggregation buffer (the latter OOMs a reducer at
    * 100 TB on near-continuous doubles). */
  def q34Percentiles(spark: SparkSession, dir: String): DataFrame = {
    OrderStats.exactPercentiles(Tables.lineitem(spark, dir),
        Seq("l_returnflag"),
        Seq(("p25", "l_quantity", 0.25),
            ("p50", "l_quantity", 0.5),
            ("p75", "l_quantity", 0.75),
            ("price_median", "l_extendedprice", 0.5)))
      .orderBy(col("l_returnflag"))
  }

  /** q34's exact percentiles through the PRODUCTION entry
    * ([[OrderStats.percentiles]], routed to histogram refinement): two
    * hash aggregations locate every requested rank's bin, and only the
    * candidate bins are sorted — the full data is never ordered. Same
    * order statistics, same interpolation arithmetic, same oracle as
    * q34 (which stays on the sort path as the differential twin); the
    * routing exists for the 100 TB shape where q34's per-group external
    * sort is the measured wall (BENCH_sf10: sort-bound, ~58× for 100×
    * data vs binned's ~8.7×). */
  def q219PercentilesBinned(spark: SparkSession, dir: String): DataFrame = {
    OrderStats.percentiles(Tables.lineitem(spark, dir),
        Seq("l_returnflag"),
        Seq(("p25", "l_quantity", 0.25),
            ("p50", "l_quantity", 0.5),
            ("p75", "l_quantity", 0.75),
            ("price_median", "l_extendedprice", 0.5)))
      .orderBy(col("l_returnflag"))
  }

  /** String function battery over part names. */
  def q35StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 3, 8).as("sub"),
        regexp_replace(col("p_name"), "a", "@").as("repl"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        reverse(col("p_type")).as("rev"),
        length(col("p_name")).cast("long").as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
      .orderBy(col("p_partkey"))
  }

  /** Calendar rollup: monthly order revenue (date_trunc both engines). */
  def q36Monthly(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy(col("month"))
  }

  /** Outer-join semantics: every customer with their order count/revenue,
    * customers without orders kept at zero. */
  def q37OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy(col("c_custkey"))
  }

  /** Salted skew-join: physically redistributed, semantically identical —
    * the oracle runs the PLAIN join, certifying the rewrite preserves
    * results. */
  def q38SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    SkewOps.saltedJoin(li, ord, Seq("l_orderkey"), saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** Exact distinct counts (shuffle-heavy dedup aggregation). */
  def q39CountDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** K5 update-only merge: acctbal bumped for keys %5==0; rows without an
    * update keep their value, update rows without a target are dropped. */
  def q40UpdateOnly(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val updates = cust.filter(col("c_custkey") % 5 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + lit(100.0))
      .unionByName( // an update for a nonexistent key must be dropped
        spark.range(1).select(lit(99999999L).as("c_custkey"),
          lit(1.0).as("c_acctbal"), lit("X").as("c_mktsegment")))
    MergeOps.updateOnly(cust, updates, Seq("c_custkey"), Seq("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Batch tumbling windows: hourly event rollup (the batch twin of the
    * streaming windowed aggregation). */
  def q45HourlyEvents(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Pivot: per user-decile event-type counts as columns (Spark `.pivot`;
    * the oracle uses portable conditional aggregation). */
  def q46Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .withColumn("decile", (col("user_id") % 10).cast("long"))
      .groupBy(col("decile"))
      .pivot(col("event_type"), types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("decile"))
  }

  /** Keyed delete (K6 `deleteFromDB`, `Wrap/DB.pm:423-450`): remove every
    * customer that placed a high-value order — an anti join on the key
    * relation (one shuffle; a broadcastable delete set becomes a
    * broadcast anti join, never a scan-and-mutate loop). */
  def q59KeyedDelete(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val dels = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    MergeOps.deleteByKey(cust, dels, Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** Skew diagnosis: the hot-key histogram (SkewOps.keyHistogram). */
  def q47KeyHistogram(spark: SparkSession, dir: String): DataFrame =
    SkewOps.keyHistogram(Tables.events(spark, dir), "user_id", topN = 20)

  /** L2 vector normalization: norms and first normalized component via
    * deterministic double folds. */
  def q48NormEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val norm = Similarity.norm(col("embedding"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), norm.as("l2"),
        (element_at(col("embedding"), 1).cast("double") / norm).as("e0_normed"))
      .orderBy(col("vec_id"))
  }

  /** int8 embedding quantization ([[Similarity.quantizeInt8]]) — the 4×
    * memory reduction billion-scale ANN needs. Every step is closed-form
    * IEEE-double arithmetic (floor-based half-up rounding), so the oracle
    * replays the whole quantize→summarize→reconstruct path bit-exactly:
    * per-vector scale, first quantized component, integer sum / squared
    * norm of the int8 vector, and the max reconstruction error. */
  def q119EmbedQuant(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(Tables.embeddings(spark, dir), "embedding")
    q.select(col("vec_id"), col("q_scale"),
        element_at(col("q_vec"), 1).cast("long").as("q0"),
        aggregate(col("q_vec"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        aggregate(col("q_vec"), lit(0L), (acc, x) => acc + x * x).as("q_norm2"),
        array_max(zip_with(col("embedding"), col("q_vec"), (v, qq) =>
          abs(v.cast("double") - qq.cast("double") * col("q_scale") / lit(127d))))
          .as("recon_err"))
      .orderBy(col("vec_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_key_histogram"   -> q47KeyHistogram _,
    "q48_norm_embeddings" -> q48NormEmbeddings _,
    "q119_embed_quant"    -> q119EmbedQuant _,
    "q45_hourly_events"   -> q45HourlyEvents _,
    "q46_pivot"           -> q46Pivot _,
    "q40_update_only"     -> q40UpdateOnly _,
    "q59_keyed_delete"    -> q59KeyedDelete _,
    "q38_salted_join"     -> q38SaltedJoin _,
    "q39_count_distinct"  -> q39CountDistinct _,
    "q31_sql_passthrough" -> q31SqlPassthrough _,
    "q32_asof_join"       -> q32AsofJoin _,
    "q33_grouping_sets"   -> q33GroupingSets _,
    "q34_percentiles"     -> q34Percentiles _,
    "q219_percentiles_binned" -> q219PercentilesBinned _,
    "q35_string_funcs"    -> q35StringFuncs _,
    "q36_monthly"         -> q36Monthly _,
    "q37_outer_join"      -> q37OuterJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q47_key_histogram" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20""".stripMargin,
    "q48_norm_embeddings" ->
      """SELECT vec_id,
        |  sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (acc, x) -> acc + x)) AS l2,
        |  CAST(embedding[1] AS DOUBLE)
        |    / sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (acc, x) -> acc + x)) AS e0_normed
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q119_embed_quant" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS q_scale
        |  FROM embeddings),
        |qq AS (
        |  SELECT vec_id, embedding, q_scale,
        |    CASE WHEN q_scale = 0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding, x ->
        |        CAST(floor(CAST(x AS DOUBLE) * 127 / q_scale + 0.5) AS BIGINT))
        |    END AS q_vec
        |  FROM q)
        |SELECT vec_id, q_scale,
        |  q_vec[1] AS q0,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), q_vec),
        |    (acc, x) -> acc + x) AS q_sum,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), q_vec),
        |    (acc, x) -> acc + x * x) AS q_norm2,
        |  list_max(list_transform(list_zip(embedding, q_vec),
        |    p -> abs(CAST(p[1] AS DOUBLE)
        |      - CAST(p[2] AS DOUBLE) * q_scale / 127))) AS recon_err
        |FROM qq ORDER BY vec_id""".stripMargin,
    "q45_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q46_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS decile,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY decile""".stripMargin,
    "q40_update_only" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q59_keyed_delete" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q38_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q39_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q31_sql_passthrough" ->
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, year(o_orderdate)
        |ORDER BY r_name, yr""".stripMargin,
    "q32_asof_join" ->
      """SELECT c.event_id, c.user_id, e.value AS err_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin,
    "q33_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '_ALL_') AS returnflag,
        |  coalesce(l_linestatus, '_ALL_') AS linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q34_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5)  AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.5) AS price_median
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // same order statistics, same interpolation — the binned-refinement
    // engine path must land on the identical values
    "q219_percentiles_binned" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5)  AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_extendedprice, 0.5) AS price_median
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q35_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  substring(p_name, 3, 8) AS sub,
        |  regexp_replace(p_name, 'a', '@', 'g') AS repl,
        |  lpad(p_brand, 12, '_') AS padded,
        |  reverse(p_type) AS rev,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  concat_ws('|', p_brand, p_type) AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q36_monthly" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q37_outer_join" ->
      """SELECT c_custkey,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(revenue, 0.0) AS revenue
        |FROM customer
        |LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
  )
}
