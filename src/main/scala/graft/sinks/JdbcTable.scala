package graft.sinks

import graft.operators.MergeOps
import graft.pipeline.Config._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JDBC twin of [[ParquetTable]] — the reference's real `storeInDB` path
  * (`Wrap/DB.pm:166-420`): conflict strategies (append / upsert /
  * delete-insert / update-only), truncate vs keepContent, addID constants,
  * and a per-load transaction (`Wrap.pm:346-417`).
  *
  * The reference loops row-by-row on one connection, INSERTing and
  * falling back to UPDATE per duplicate-key error. A Spark cluster can't
  * funnel 100 TB through one connection, so the same contract is
  * re-expressed in two phases:
  *
  *  1. **Stage** — executors write partitions in parallel into a staging
  *     table via batched `PreparedStatement.executeBatch` (parameterized,
  *     never string-interpolated values — unlike the reference's quoting
  *     at `Wrap/DB.pm:311-313`, injection-safe by construction). Upsert
  *     batches are last-wins-deduplicated in Spark first, so staging
  *     holds at most one row per key.
  *  2. **Apply** — ONE driver connection runs the strategy as set-based
  *     SQL (ANSI MERGE / DELETE+INSERT SELECT) inside a single
  *     transaction: readers see the old or the new table state, never a
  *     partial load — the reference's transaction bracket, but with the
  *     data movement parallelized.
  *
  * Verified two ways: hermetically (JdbcTableSpec — statement generator +
  * orchestration against a recording session) and end-to-end against a
  * real embedded JDBC database (DerbyRoundtripSpec + the q112 driver gate
  * — Apache Derby, real transactions / MERGE / rollback / multi-result
  * sets), via [[SqlDialect.Derby]].
  */
object JdbcTable {

  /** Minimal connection surface — exactly what `store` needs. Production:
    * [[ConnectionSession]] over `java.sql.Connection`; tests: a recording
    * fake. */
  trait JdbcSession extends AutoCloseable {
    def execute(sql: String): Unit
    /** Prepared-statement batch insert; returns rows written. */
    def executeBatch(sql: String, rows: Iterator[Seq[Any]], batchSize: Int): Long
    /** Parameterized SELECT returning all rows (registry reads). */
    def query(sql: String, params: Seq[Any] = Nil): Seq[Seq[Any]]
    def commit(): Unit
    def rollback(): Unit
    def close(): Unit
  }

  /** Factory must be `Serializable`: it ships to executors for the staging
    * phase. */
  type SessionFactory = () => JdbcSession

  /** Production session (deployment path — no DB in this container). */
  final class ConnectionSession(conn: java.sql.Connection) extends JdbcSession {
    conn.setAutoCommit(false)
    def execute(sql: String): Unit = {
      val st = conn.createStatement()
      try st.execute(sql) finally st.close()
    }
    def executeBatch(sql: String, rows: Iterator[Seq[Any]], batchSize: Int): Long = {
      val ps = conn.prepareStatement(sql)
      try {
        var total = 0L
        var pending = 0
        rows.foreach { r =>
          var i = 0
          while (i < r.length) { ps.setObject(i + 1, r(i)); i += 1 }
          ps.addBatch(); pending += 1; total += 1
          if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) ps.executeBatch()
        total
      } finally ps.close()
    }
    def query(sql: String, params: Seq[Any] = Nil): Seq[Seq[Any]] = {
      val ps = conn.prepareStatement(sql)
      try {
        params.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
        val rs = ps.executeQuery()
        val n = rs.getMetaData.getColumnCount
        val buf = Vector.newBuilder[Seq[Any]]
        while (rs.next()) buf += (1 to n).map(rs.getObject(_): Any)
        rs.close()
        buf.result()
      } finally ps.close()
    }
    def commit(): Unit = conn.commit()
    def rollback(): Unit = conn.rollback()
    /** Uncommitted work dies with the session: autoCommit is off, so even
      * a bare SELECT leaves a transaction open, and some engines (Derby)
      * refuse to close a connection mid-transaction. Anything worth
      * keeping was already `commit()`ed; rolling back here is the only
      * safe default — closing must never silently commit. */
    def close(): Unit = {
      try conn.rollback() catch { case _: java.sql.SQLException => }
      conn.close()
    }
  }

  /** `DriverManager`-backed factory for deployments:
    * `JdbcTable.store(df, table, db, JdbcTable.connect(url, props))`. */
  def connect(url: String, props: Map[String, String] = Map.empty): SessionFactory = {
    val serializableProps = props.toSeq // Map's default impl is serializable, Seq keeps it explicit
    () => {
      val p = new java.util.Properties()
      serializableProps.foreach { case (k, v) => p.setProperty(k, v) }
      new ConnectionSession(java.sql.DriverManager.getConnection(url, p))
    }
  }

  /** SQL passthrough source over JDBC (S6's connector half): partitioned
    * parallel read when `partitionColumn` bounds are given — each executor
    * reads its own key range instead of one connection streaming 100 TB. */
  def load(spark: SparkSession, url: String, query: String,
           props: Map[String, String] = Map.empty,
           partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc").option("url", url)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    // Spark's JDBC source rejects `query` together with `partitionColumn`
    // (JDBCOptions demands `dbtable` on the partitioned path) — wrap the
    // SQL as a derived table there; `query` stays for the single-reader path.
    partitionColumn.fold(withProps.option("query", query)) { case (c, lo, hi, n) =>
      withProps.option("dbtable", s"($query) graft_subq")
        .option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
    }.load()
  }

  /** Staging-table partition-ownership column: each Spark task stages only
    * rows tagged with its own partition id, and re-stages them
    * delete-then-insert in one transaction — so task retries and
    * speculative duplicates converge to exactly one copy per partition. */
  val PartCol = "_graft_part"

  /** addID constants + strategy-specific pre-resolution (upsert last-wins
    * dedup so the apply-phase MERGE sees one row per key). */
  private def resolveForStrategy(incoming: DataFrame, db: DbConfig,
                                 ordCol: String): DataFrame = {
    val withId = db.addID.foldLeft(incoming) { case (df, (k, v)) =>
      df.withColumn(k, lit(v))
    }
    def ordered: DataFrame = {
      MergeOps.requireExactOrder(withId, ordCol)
      if (withId.columns.contains(ordCol)) withId
      else withId.withColumn(ordCol, monotonically_increasing_id())
    }
    db.strategy match {
      case Upsert(keys) if db.incrementalStore =>
        // within-batch resolution is per-column coalesce cascade; the
        // apply MERGE then coalesces against the target's values
        val o = ordered
        MergeOps.upsertIncremental(o.limit(0), o, keys, ordCol)
      case Upsert(keys) =>
        val o = ordered
        MergeOps.upsertLastWins(o.limit(0), o, keys, ordCol)
      case InsertIgnoreDups(keys) =>
        // first occurrence per key survives; the apply INSERT then
        // anti-joins the target (NOT EXISTS)
        val o = ordered
        MergeOps.insertIgnoreDups(o.limit(0).drop(ordCol), o, keys, ordCol)
      case _ => if (withId.columns.contains(ordCol)) withId.drop(ordCol) else withId
    }
  }

  /** Dialect-aware `DROP TABLE IF EXISTS`: catalog-probe + plain DROP for
    * dialects without the IF EXISTS form. */
  private def dropIfExists(s: JdbcSession, table: String,
                           dialect: SqlDialect): Unit =
    dialect.tableExistsSql match {
      case Some(probe) =>
        if (s.query(probe, Seq(table)).nonEmpty) s.execute(JdbcSql.drop(table))
      case None => s.execute(JdbcSql.dropIfExists(table))
    }

  private def createStaging(s: JdbcSession, stg: String,
                            schema: StructType, dialect: SqlDialect): Unit = {
    dropIfExists(s, stg, dialect)
    s.execute(JdbcSql.createTable(stg,
      StructType(schema.fields :+ StructField(PartCol, IntegerType, nullable = false)),
      dialect))
  }

  /** Phase 1: parallel batched staging inserts, one connection+txn per
    * partition. Each task first deletes its own partition's rows
    * (`PartCol`), then inserts — idempotent under task retry. */
  /** Error context for a failed insert batch, in the reference's
    * `debugKeyIndicator` spirit (`Wrap/DB.pm:232-234,330`): the indicator
    * names the columns whose values identify the offending record (any
    * separator/`=?` template form — identifiers are extracted). The
    * offending rows come from `BatchUpdateException.getUpdateCounts`
    * (drivers either mark EXECUTE_FAILED entries or stop at the first
    * failure); when the driver reports nothing usable, the batch bounds
    * are described instead of guessing. */
  private def describeFailedKeys(e: Throwable, chunk: IndexedSeq[Seq[Any]],
                                 cols: Seq[String], indicator: String): String = {
    val names = indicator.split("[^A-Za-z0-9_]+").filter(_.nonEmpty).toSeq
    val idx = names.flatMap(n => cols.indexOf(n) match {
      case -1 => None; case i => Some((n, i))
    })
    if (idx.isEmpty) return s"(debugKeyIndicator '$indicator' matches no staged column)"
    def keysOf(r: Seq[Any]): String =
      idx.map { case (n, i) => s"$n=${r(i)}" }.mkString(",")
    e match {
      case b: java.sql.BatchUpdateException =>
        val c = Option(b.getUpdateCounts).getOrElse(Array.emptyIntArray)
        val failed = c.zipWithIndex.collect {
          case (java.sql.Statement.EXECUTE_FAILED, i) if i < chunk.length => i
        }
        if (failed.nonEmpty)
          failed.take(3).map(i => keysOf(chunk(i))).mkString("; ")
        else if (c.length < chunk.length) // driver stopped at first failure
          keysOf(chunk(c.length))
        else s"within batch ${keysOf(chunk.head)} .. ${keysOf(chunk.last)}"
      case _ => s"within batch ${keysOf(chunk.head)} .. ${keysOf(chunk.last)}"
    }
  }

  private def stagePartitions(resolved: DataFrame, stg: String,
                              cols: Seq[String], sessionFactory: SessionFactory,
                              batchSize: Int, debugKeyIndicator: String = ""): Unit = {
    val insertSql = JdbcSql.insert(stg, cols :+ PartCol)
    val deleteSql = JdbcSql.deleteByKey(stg, Seq(PartCol))
    resolved.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val s = sessionFactory()
        try {
          s.executeBatch(deleteSql, Iterator(Seq[Any](pid)), 1)
          if (debugKeyIndicator.isEmpty)
            s.executeBatch(insertSql, rows.map(_.toSeq :+ pid), batchSize)
          else
            // chunk driver-side so a failed executeBatch can name the
            // offending record (Wrap/DB.pm's debugKeyIndicator contract)
            rows.map(_.toSeq :+ pid).grouped(batchSize).foreach { chunk =>
              val c = chunk.toIndexedSeq
              try s.executeBatch(insertSql, c.iterator, batchSize)
              catch { case e: java.sql.SQLException =>
                throw new java.sql.SQLException(
                  s"${e.getMessage} [offending keys: " +
                    s"${describeFailedKeys(e, c, cols, debugKeyIndicator)}]",
                  e.getSQLState, e.getErrorCode, e)
              }
            }
          s.commit()
        } catch { case t: Throwable => s.rollback(); throw t }
        finally s.close()
      }
    }
  }

  /** Phase 2: ONE transaction applies staging to the target and drops the
    * staging table. Because the drop rides the same transaction, a load
    * can never apply twice: after the first commit the staging table is
    * gone, and any re-apply fails instead of double-writing. */
  private def applyPhase(db: DbConfig, table: String, stg: String,
                         cols: Seq[String], sessionFactory: SessionFactory,
                         registry: Option[(String, String)]): Unit = {
    val apply = sessionFactory()
    try {
      if (!db.keepContent) apply.execute(JdbcSql.truncate(table))
      JdbcSql.applyStatements(db.strategy, table, stg, cols,
        incremental = db.incrementalStore)
        .foreach(apply.execute)
      registry.foreach { case (reg, loadId) =>
        apply.executeBatch(JdbcSql.setStatus(reg),
          Iterator(Seq[Any]("APPLIED", loadId)), 1)
      }
      apply.execute(JdbcSql.drop(stg))
      apply.commit()
    } catch {
      case t: Throwable => apply.rollback(); throw t
    } finally apply.close()
  }

  /** Store `incoming` into `table` under the configured strategy, staged
    * through `stagingSuffix` and applied in one driver transaction.
    * Mirrors [[ParquetTable.store]]'s contract on a DBMS. For restart
    * resumability across driver failures, use [[storeResumable]]. */
  def store(incoming: DataFrame, table: String, db: DbConfig,
            sessionFactory: SessionFactory, batchSize: Int = 1000,
            ordCol: String = "_lineno",
            stagingSuffix: String = "_graft_stg",
            dialect: SqlDialect = SqlDialect.Ansi): Unit = {
    val resolved = resolveForStrategy(incoming, db, ordCol)
    val stg = table + stagingSuffix
    val cols = resolved.schema.fields.map(_.name).toSeq
    val driver = sessionFactory()
    try {
      createStaging(driver, stg, resolved.schema, dialect)
      driver.commit()
    } finally driver.close()
    stagePartitions(resolved, stg, cols, sessionFactory, batchSize, db.debugKeyIndicator)
    applyPhase(db, table, stg, cols, sessionFactory, registry = None)
  }

  /** Exactly-once resumable store: [[store]] plus a load-registry protocol
    * that survives driver restarts. The caller names the load (`loadId` —
    * e.g. the reference's process + run date, the first-run-success memory
    * of `Wrap.pm`'s planned repetitions); re-invoking with the same id
    * after ANY failure resumes instead of double-applying:
    *
    *  - registry row `STAGING` → staging may be partial; it is rebuilt
    *    from scratch (drop/create + part-scoped restage).
    *  - `STAGED` → staging is complete; skip straight to the apply phase.
    *  - `APPLIED` → the load already committed; the call is a no-op.
    *
    * The `STAGED` marker commits only after every partition staged; the
    * `APPLIED` marker rides the apply transaction itself, and the staging
    * drop in that same transaction makes a second apply structurally
    * impossible. Registry + staging live in the target DBMS, so the
    * protocol needs no coordinator beyond the database. */
  def storeResumable(incoming: DataFrame, table: String, db: DbConfig,
                     sessionFactory: SessionFactory, loadId: String,
                     batchSize: Int = 1000, ordCol: String = "_lineno",
                     registryTable: String = "graft_loads",
                     dialect: SqlDialect = SqlDialect.Ansi): Unit = {
    val stg = s"${table}_graft_stg_$loadId"
    val boot = sessionFactory()
    val status = try {
      dialect.tableExistsSql match {
        case Some(probe) =>
          if (boot.query(probe, Seq(registryTable)).isEmpty)
            boot.execute(JdbcSql.createRegistry(registryTable, ifNotExists = false))
        case None => boot.execute(JdbcSql.createRegistry(registryTable))
      }
      boot.commit()
      boot.query(JdbcSql.selectStatus(registryTable), Seq(loadId))
        .headOption.map(_.head.toString)
    } finally boot.close()
    if (status.contains("APPLIED")) return

    val resolved = resolveForStrategy(incoming, db, ordCol)
    val cols = resolved.schema.fields.map(_.name).toSeq
    if (!status.contains("STAGED")) {
      val d = sessionFactory()
      try {
        d.executeBatch(JdbcSql.deleteByKey(registryTable, Seq("load_id")),
          Iterator(Seq[Any](loadId)), 1)
        d.executeBatch(JdbcSql.insert(registryTable, Seq("load_id", "target", "status")),
          Iterator(Seq[Any](loadId, table, "STAGING")), 1)
        createStaging(d, stg, resolved.schema, dialect)
        d.commit()
      } catch { case t: Throwable => d.rollback(); throw t }
      finally d.close()
      stagePartitions(resolved, stg, cols, sessionFactory, batchSize, db.debugKeyIndicator)
      val m = sessionFactory()
      try {
        m.executeBatch(JdbcSql.setStatus(registryTable),
          Iterator(Seq[Any]("STAGED", loadId)), 1)
        m.commit()
      } finally m.close()
    }
    applyPhase(db, table, stg, cols, sessionFactory,
      registry = Some((registryTable, loadId)))
  }

  /** S8 `doInDB`, JDBC flavor (`Wrap/DB.pm:133-163`): execute one
    * parameterized statement and drain EVERY result set it produces (the
    * reference's `odbc_more_results` loop — stored procedures returning
    * several sets). Returns one row-map sequence per result set. Driver-
    * side utility for control statements, not a data path — bulk data
    * moves through [[store]]/[[load]]. */
  def execStatement(conn: java.sql.Connection, sql: String,
                    params: Seq[Any] = Nil): Seq[Seq[Map[String, Any]]] = {
    val ps = conn.prepareStatement(sql)
    try {
      params.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
      var results = Vector.empty[Seq[Map[String, Any]]]
      var isRs = ps.execute()
      var done = false
      while (!done) {
        if (isRs) {
          val rs = ps.getResultSet
          val md = rs.getMetaData
          val cols = (1 to md.getColumnCount).map(md.getColumnLabel)
          val buf = Vector.newBuilder[Map[String, Any]]
          while (rs.next()) buf += cols.map(c => c -> rs.getObject(c)).toMap
          results :+= buf.result()
          rs.close()
        } else if (ps.getUpdateCount == -1) done = true
        if (!done) isRs = ps.getMoreResults()
      }
      results
    } finally ps.close()
  }

  /** Keyed delete (K6, `Wrap/DB.pm:453-480`): batched
    * `DELETE ... WHERE key = ?` over the key relation. */
  def deleteKeys(keys: DataFrame, table: String, keyCols: Seq[String],
                 sessionFactory: SessionFactory, batchSize: Int = 1000): Unit = {
    val sql = JdbcSql.deleteByKey(table, keyCols)
    val projected = keys.select(keyCols.map(col): _*)
    projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val s = sessionFactory()
        try {
          s.executeBatch(sql, rows.map(_.toSeq), batchSize)
          s.commit()
        } catch { case t: Throwable => s.rollback(); throw t }
        finally s.close()
      }
    }
  }
}

/** The per-DBMS variation points [[JdbcTable]] needs — the same role as
  * Spark's own `JdbcDialect`, kept to exactly what the sink uses. The
  * default is plain ANSI; [[SqlDialect.Derby]] is the embedded-Derby
  * instance the integration spec runs against. */
final case class SqlDialect(
    /** DDL type for Spark `StringType`. */
    stringType: String = "VARCHAR",
    /** DDL type for Spark `BinaryType`. */
    binaryType: String = "VARBINARY",
    /** Catalog probe (`SELECT 1 ... WHERE name = ?`) for dialects without
      * `DROP TABLE IF EXISTS` / `CREATE TABLE IF NOT EXISTS`; when set,
      * the sink probes then issues the plain DROP/CREATE. */
    tableExistsSql: Option[String] = None)

object SqlDialect {
  val Ansi: SqlDialect = SqlDialect()

  /** Apache Derby: VARCHAR requires a length (32672 is Derby's max),
    * binary is the `FOR BIT DATA` form, and there is no `IF [NOT]
    * EXISTS` — existence goes through SYS.SYSTABLES (quoted identifiers
    * are stored case-exact, so the probe binds the exact name). The probe
    * is scoped to the connection's CURRENT SCHEMA: a same-named table in
    * another schema must not read as "exists", or dropIfExists/create
    * would skip creation and fail later on access. */
  val Derby: SqlDialect = SqlDialect(
    stringType = "VARCHAR(32672)",
    binaryType = "VARCHAR (32672) FOR BIT DATA",
    tableExistsSql = Some(
      "SELECT 1 FROM SYS.SYSTABLES T JOIN SYS.SYSSCHEMAS S " +
        "ON T.SCHEMAID = S.SCHEMAID " +
        "WHERE T.TABLENAME = ? AND S.SCHEMANAME = CURRENT SCHEMA"))
}

/** Pure SQL generation for [[JdbcTable]] — deterministic strings, unit-
  * testable without a connection. Identifiers are double-quote-escaped
  * (ANSI); values never appear in SQL text (prepared-statement `?`s). */
object JdbcSql {

  def q(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""

  /** Spark → ANSI DDL type (staging tables). */
  def sqlType(dt: DataType, dialect: SqlDialect = SqlDialect.Ansi): String = dt match {
    case ByteType | ShortType => "SMALLINT"
    case IntegerType          => "INTEGER"
    case LongType             => "BIGINT"
    case FloatType            => "REAL"
    case DoubleType           => "DOUBLE PRECISION"
    case BooleanType          => "BOOLEAN"
    case DateType             => "DATE"
    case _: TimestampType     => "TIMESTAMP"
    case d: DecimalType       => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType           => dialect.binaryType
    case _                    => dialect.stringType
  }

  def createTable(table: String, schema: StructType,
                  dialect: SqlDialect = SqlDialect.Ansi): String = {
    val cols = schema.fields.map { f =>
      val nullable = if (f.nullable) "" else " NOT NULL"
      s"${q(f.name)} ${sqlType(f.dataType, dialect)}$nullable"
    }
    s"CREATE TABLE ${q(table)} (${cols.mkString(", ")})"
  }

  def drop(table: String): String = s"DROP TABLE ${q(table)}"

  def dropIfExists(table: String): String = s"DROP TABLE IF EXISTS ${q(table)}"

  def truncate(table: String): String = s"DELETE FROM ${q(table)}"

  def insert(table: String, cols: Seq[String]): String =
    s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

  def deleteByKey(table: String, keyCols: Seq[String]): String =
    s"DELETE FROM ${q(table)} WHERE " +
      keyCols.map(k => s"${q(k)} = ?").mkString(" AND ")

  /** Load-registry DDL for [[JdbcTable.storeResumable]]. `IF NOT EXISTS`
    * is the one non-ANSI form used (supported by every mainstream DBMS;
    * dialects with a `tableExistsSql` probe get the plain CREATE
    * instead). Registry keys are short load identifiers — VARCHAR(200)
    * keeps the primary key inside every DBMS's index-key limit (Derby
    * caps index keys near half a page; an unbounded VARCHAR PK fails). */
  def createRegistry(table: String, ifNotExists: Boolean = true): String = {
    val head = if (ifNotExists) "CREATE TABLE IF NOT EXISTS" else "CREATE TABLE"
    s"$head ${q(table)} (" +
      s"${q("load_id")} VARCHAR(200) NOT NULL, ${q("target")} VARCHAR(200) NOT NULL, " +
      s"${q("status")} VARCHAR(200) NOT NULL, PRIMARY KEY (${q("load_id")}))"
  }

  def selectStatus(registry: String): String =
    s"SELECT ${q("status")} FROM ${q(registry)} WHERE ${q("load_id")} = ?"

  def setStatus(registry: String): String =
    s"UPDATE ${q(registry)} SET ${q("status")} = ? WHERE ${q("load_id")} = ?"

  private def onClause(tgt: String, stg: String, keys: Seq[String]): String =
    keys.map(k => s"${q(tgt)}.${q(k)} = ${q(stg)}.${q(k)}").mkString(" AND ")

  /** The apply-phase statements for each conflict strategy — set-based SQL
    * replacing the reference's per-row INSERT-else-UPDATE loop
    * (`Wrap/DB.pm:386-412`). */
  def applyStatements(strategy: StoreStrategy, table: String, stg: String,
                      cols: Seq[String], incremental: Boolean = false): Seq[String] = {
    val insertSelect =
      s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
        s"SELECT ${cols.map(q).mkString(", ")} FROM ${q(stg)}"
    strategy match {
      case Append => Seq(insertSelect)

      case Upsert(keys) =>
        val setCols = cols.filterNot(keys.contains)
        // incrementalStore (Wrap/DB.pm:318): a NULL staged field keeps
        // the target's existing value — COALESCE in the UPDATE branch
        val sets = setCols.map { c =>
          val src =
            if (incremental) s"COALESCE(${q(stg)}.${q(c)}, ${q(table)}.${q(c)})"
            else s"${q(stg)}.${q(c)}"
          s"${q(c)} = $src"
        }.mkString(", ")
        val insCols = cols.map(q).mkString(", ")
        val insVals = cols.map(c => s"${q(stg)}.${q(c)}").mkString(", ")
        Seq(
          s"MERGE INTO ${q(table)} USING ${q(stg)} " +
            s"ON ${onClause(table, stg, keys)} " +
            s"WHEN MATCHED THEN UPDATE SET $sets " +
            s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)")

      case InsertIgnoreDups(keys) =>
        // ignoreDuplicateErrs (Wrap/DB.pm:403): insert only absent keys;
        // batch-internal duplicates were first-wins-resolved at staging
        Seq(insertSelect +
          s" WHERE NOT EXISTS (SELECT 1 FROM ${q(table)} " +
          s"WHERE ${onClause(table, stg, keys)})")

      case DeleteInsert(selector) =>
        val exists =
          s"EXISTS (SELECT 1 FROM ${q(stg)} WHERE ${onClause(table, stg, selector)})"
        Seq(
          s"DELETE FROM ${q(table)} WHERE $exists",
          insertSelect)

      case UpdateOnly(keys, valueCols) =>
        val sets = valueCols.map(c => s"${q(c)} = ${q(stg)}.${q(c)}").mkString(", ")
        Seq(
          s"MERGE INTO ${q(table)} USING ${q(stg)} " +
            s"ON ${onClause(table, stg, keys)} " +
            s"WHEN MATCHED THEN UPDATE SET $sets")
    }
  }
}
