package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full declared operator surface: each entry is a
  * DataFrame program exercising one operator family from SURVEY.md §2, and
  * (where SQL-expressible) `oracleSql` carries the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Column names/aliases
  * match pairwise by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q5NationRevenue(spark, "/root/testdata/sf0.001")

  private val registries: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    RelationalQueries.all,
    EtlQueries.all,
    PipelineQueries.all,
    SourceQueries.all,
    ExtendedQueries.all,
    CurationQueries.all,
    IndexQueries.all,
    ScaleQueries.all,
    JdbcQueries.all,
    StreamingQueries.all,
    CorpusQueries.all,
    SelectionQueries.all,
    SignalQueries.all,
  )

  private val oracleRegistries: Seq[Map[String, String]] = Seq(
    RelationalQueries.oracles,
    EtlQueries.oracles,
    PipelineQueries.oracles,
    SourceQueries.oracles,
    ExtendedQueries.oracles,
    CurationQueries.oracles,
    IndexQueries.oracles,
    ScaleQueries.oracles,
    JdbcQueries.oracles,
    StreamingQueries.oracles,
    CorpusQueries.oracles,
    SelectionQueries.oracles,
    SignalQueries.oracles,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.reduce(_ ++ _)

  /** DuckDB INLINES every CTE reference by default, so the composed
    * k-means-replay oracles — where one training's output CTE feeds
    * another's corpus, which feeds probe/assign/dedup chains — re-execute
    * whole training pipelines once per reference, multiplying with
    * nesting depth: q186's oracle measured ~40 min inlined vs 0.8 s
    * materialized at sf0.01 (and q183 similar) — more than the entire
    * rest of the suite combined, and enough to blow any correctness-run
    * time budget. `AS MATERIALIZED` is a pure optimization fence
    * (results bit-identical); every `ident AS (` in the oracle corpus is
    * a CTE definition (audited — the one `d(depth) AS (` column-list
    * form is also valid with MATERIALIZED), so the rewrite is applied
    * globally at this single assembly point; the only other `AS (`
    * construct in the corpus is the named-window clause
    * (`WINDOW w AS (...)`, q101/q174), which the second pass restores. */
  /** The pre-rewrite corpus, exposed for ContractSpec's shape audit:
    * [[materializeCtes]] is a blind textual rewrite whose safety rests
    * on corpus-wide invariants (exact-case `AS (`, at most one named
    * window per WINDOW clause) — the audit makes a future oracle that
    * breaks them fail loudly at test time instead of silently
    * mis-rewriting at verify time. */
  private[graft] def rawOracleSql: Map[String, String] =
    oracleRegistries.reduce(_ ++ _)

  private def materializeCtes(sql: String): String =
    sql.replace("AS (", "AS MATERIALIZED (")
      .replaceAll("WINDOW (\\w+) AS MATERIALIZED \\(", "WINDOW $1 AS (")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    oracleRegistries.reduce(_ ++ _)
      .map { case (k, v) => k -> materializeCtes(v) }
}
