package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-gate queries for the round-3 depth operators: sequence packing,
  * mixture weighting, token-budget capping (training-data layout), and the
  * warehouse CDC family (snapshot diff, SCD2 historization, column
  * profiling). Every oracle recomputes the seeded universal-hash
  * arithmetic from [[Sampling.coef]] so the gates are value-exact, not
  * rows-only — same discipline as the q51/q53 oracles.
  */
object CurationQueries {

  /** Concat-then-chunk sequence packing of the corpus into 256-token
    * packs across 8 hash shards. */
  def q68SeqPack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("n_tokens"))
    Packing.packSequences(docs, "doc_id", "n_tokens",
        capacity = 256, nShards = 8, seed = 5L)
      .orderBy(col("doc_id"))
  }

  /** Mixture/epoch weighting: per-source epochs 0.5/1.1/1.7/2.3/2.9
    * (tenths, decided by the numeric source suffix mod 5) — integer
    * thresholds, explode to per-copy rows. */
  def q69EpochMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val idx = regexp_extract(col("source"), "(\\d+)", 1).cast("long")
    val num = lit(5L) + pmod(idx, lit(5L)) * lit(6L)
    Sampling.epochMixRational(docs, "doc_id", num, den = 10, seed = 17L)
      .orderBy(col("doc_id"), col("copy_id"))
  }

  /** Token-budget domain capping: keep each source's documents in
    * key-hash order until 800 cumulative tokens. */
  def q70TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    Sampling.tokenBudget(docs, "source", "doc_id", "n_tokens",
        budget = 800L, seed = 19L)
      .orderBy(col("doc_id"))
  }

  /** Keyed snapshot diff over two deterministic orders snapshots
    * (drops keys ≡ 0 mod 97, restates status on mod 11, bumps price on
    * mod 13, inserts shifted keys on mod 101). */
  def q71SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val n = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .withColumn("o_orderstatus",
        when(pmod(col("o_orderkey"), lit(11)) === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(13)) === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(pmod(col("o_orderkey"), lit(101)) === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))
    Cdc.snapshotDiff(o, n, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** SCD2 historization of the events stream: per-user event_type
    * intervals with change suppression. */
  def q72Scd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    Cdc.scd2(ev, Seq("user_id"), "ts", "event_id", Seq("event_type"))
      .orderBy(col("user_id"), col("version"))
  }

  /** One-pass column profile of customer (3 numeric + 2 string columns). */
  def q73Profile(spark: SparkSession, dir: String): DataFrame = {
    Profile.profile(Tables.customer(spark, dir),
        numericCols = Seq("c_custkey", "c_nationkey", "c_acctbal"),
        stringCols = Seq("c_name", "c_mktsegment"))
      .orderBy(col("column_name"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_seq_pack"      -> q68SeqPack _,
    "q69_epoch_mix"     -> q69EpochMix _,
    "q70_token_budget"  -> q70TokenBudget _,
    "q71_snapshot_diff" -> q71SnapshotDiff _,
    "q72_scd2"          -> q72Scd2 _,
    "q73_profile"       -> q73Profile _,
  )

  private val P = Sampling.P

  private val seqPackSql: String = {
    val (a, b) = Sampling.coef(5L)
    s"""WITH base AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
      |    ((doc_id % $P) * $a + $b) % $P AS h
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, n_tokens, h, CAST(h % 8 AS INT) AS shard FROM base),
      |cum AS (
      |  SELECT doc_id, shard, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM sh)
      |SELECT doc_id, shard,
      |  CAST(c - n_tokens AS BIGINT) AS start_offset,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST((c - n_tokens) // 256 AS BIGINT) AS pack_first,
      |  CAST(greatest((c - 1) // 256, (c - n_tokens) // 256) AS BIGINT) AS pack_last,
      |  ((c - 1) // 256 > (c - n_tokens) // 256) AS crosses
      |FROM cum ORDER BY doc_id""".stripMargin
  }

  private val epochMixSql: String = {
    val (a, b) = Sampling.coef(17L)
    s"""WITH base AS (
      |  SELECT doc_id, source,
      |    5 + (CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 5) * 6 AS num,
      |    ((doc_id % $P) * $a + $b) % $P AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |    num // 10 + CASE WHEN h < (num % 10) * $P // 10 THEN 1 ELSE 0 END AS n_copies
      |  FROM base)
      |SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
      |  CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy_id
      |FROM c
      |ORDER BY doc_id, copy_id""".stripMargin
  }

  private val tokenBudgetSql: String = {
    val (a, b) = Sampling.coef(19L)
    s"""WITH base AS (
      |  SELECT doc_id, source,
      |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
      |    ((doc_id % $P) * $a + $b) % $P AS h
      |  FROM documents),
      |cum AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tokens_before
      |  FROM base)
      |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(tokens_before AS BIGINT) AS tokens_before
      |FROM cum WHERE tokens_before < 800
      |ORDER BY doc_id""".stripMargin
  }

  private val snapshotDiffSql: String =
    """WITH oldp AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |newp AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |j AS (
      |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |    o.o_orderstatus AS o_orderstatus_old, n.o_orderstatus AS o_orderstatus_new,
      |    o.o_totalprice AS o_totalprice_old, n.o_totalprice AS o_totalprice_new,
      |    o.o_orderkey IS NOT NULL AS in_old, n.o_orderkey IS NOT NULL AS in_new
      |  FROM oldp o FULL OUTER JOIN newp n ON o.o_orderkey = n.o_orderkey),
      |labeled AS (
      |  SELECT o_orderkey,
      |    CASE WHEN NOT in_old THEN 'insert'
      |         WHEN NOT in_new THEN 'delete'
      |         WHEN o_orderstatus_old IS DISTINCT FROM o_orderstatus_new
      |           OR o_totalprice_old IS DISTINCT FROM o_totalprice_new THEN 'update'
      |         ELSE 'same' END AS status,
      |    CASE WHEN in_old AND in_new
      |           AND (o_orderstatus_old IS DISTINCT FROM o_orderstatus_new
      |             OR o_totalprice_old IS DISTINCT FROM o_totalprice_new)
      |      THEN concat_ws(',',
      |        CASE WHEN o_orderstatus_old IS DISTINCT FROM o_orderstatus_new
      |             THEN 'o_orderstatus' END,
      |        CASE WHEN o_totalprice_old IS DISTINCT FROM o_totalprice_new
      |             THEN 'o_totalprice' END)
      |      ELSE '' END AS changed_cols,
      |    o_orderstatus_old, o_orderstatus_new, o_totalprice_old, o_totalprice_new
      |  FROM j)
      |SELECT * FROM labeled WHERE status <> 'same'
      |ORDER BY o_orderkey""".stripMargin

  private val scd2Sql: String =
    """WITH ch AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id
      |  FROM ch WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type),
      |v AS (
      |  SELECT user_id, event_type,
      |    epoch_us(ts) AS valid_from_us,
      |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
      |  FROM chg)
      |SELECT user_id, event_type, valid_from_us, valid_to_us, version,
      |  valid_to_us IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  private val profileSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
         |  CAST(NULL AS DOUBLE) AS avg_len
         |FROM customer""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  min($c) AS min_str, max($c) AS max_str,
         |  CAST(sum(length($c)) AS DOUBLE) / CAST(count($c) AS DOUBLE) AS avg_len
         |FROM customer""".stripMargin
    (Seq("c_custkey", "c_nationkey", "c_acctbal").map(num) ++
      Seq("c_name", "c_mktsegment").map(str))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  val oracles: Map[String, String] = Map(
    "q68_seq_pack"      -> seqPackSql,
    "q69_epoch_mix"     -> epochMixSql,
    "q70_token_budget"  -> tokenBudgetSql,
    "q71_snapshot_diff" -> snapshotDiffSql,
    "q72_scd2"          -> scd2Sql,
    "q73_profile"       -> profileSql,
  )
}
