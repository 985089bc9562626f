package graft

import graft.pipeline.Config._
import graft.sinks.{JdbcSql, JdbcTable, SqlDialect}
import org.apache.spark.sql.functions._

/** End-to-end verification of the JDBC sink against a REAL embedded JDBC
  * database — Apache Derby (in /opt/spark/jars), in-memory databases, one
  * per test. This closes the round-3 verification gap: the same
  * orchestration JdbcTableSpec proves hermetically is exercised here with
  * real transactions, a real ANSI MERGE, real rollback, and real
  * multi-result-set procedures (`/root/reference/Wrap/DB.pm:166-420`,
  * `Wrap.pm:346-417`). */
class DerbyRoundtripSpec extends SparkSpec {
  import spark.implicits._

  graft.operators.DerbyBoot.ensure()

  private var dbN = 0
  /** Fresh in-memory database per test; factory is serializable (URL
    * string only) so the staging phase runs on executor threads. */
  private def freshDb(): (String, JdbcTable.SessionFactory) = synchronized {
    dbN += 1
    val url = s"jdbc:derby:memory:graftspec$dbN;create=true"
    (url, JdbcTable.connect(url))
  }

  private def createTarget(sf: JdbcTable.SessionFactory, table: String,
                           df: org.apache.spark.sql.DataFrame): Unit = {
    val s = sf()
    try {
      s.execute(JdbcSql.createTable(table, df.schema, SqlDialect.Derby))
      s.commit()
    } finally s.close()
  }

  private def readBack(url: String, table: String, cols: Seq[String]) =
    JdbcTable.load(spark, url,
      s"SELECT ${cols.map(JdbcSql.q).mkString(", ")} FROM ${JdbcSql.q(table)}")

  test("append stores through real staging + one-txn apply and reads back") {
    val (url, sf) = freshDb()
    val df = (1 to 20).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("k", "v", "x")
      .repartition(4)
    createTarget(sf, "t", df)
    JdbcTable.store(df, "t", DbConfig(strategy = Append, keepContent = true),
      sf, batchSize = 7, dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("k", "v", "x")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq == (1 to 20).map(i => (i.toLong, s"v$i", i * 1.5)))
    // staging table was dropped inside the apply transaction
    val s = sf()
    try assert(s.query(SqlDialect.Derby.tableExistsSql.get,
      Seq("t_graft_stg")).isEmpty, "staging table must not survive the apply")
    finally s.close()
  }

  test("upsert runs a real MERGE: updates matches, inserts the rest, last wins") {
    val (url, sf) = freshDb()
    val df0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    createTarget(sf, "t", df0)
    JdbcTable.store(df0, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    // key 2 updated (twice — later _lineno must win), key 3 inserted
    val delta = Seq((2L, "WRONG", 0L), (2L, "B2", 1L), (3L, "c", 2L))
      .toDF("k", "v", "_lineno").repartition(2)
    JdbcTable.store(delta, "t",
      DbConfig(strategy = Upsert(Seq("k")), keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("k", "v")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("delete-insert replaces only the selected keys; truncate empties first") {
    val (url, sf) = freshDb()
    val df0 = Seq((1L, 1, "a"), (1L, 2, "b"), (2L, 1, "c")).toDF("g", "i", "v")
    createTarget(sf, "t", df0)
    JdbcTable.store(df0, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    // reload group 1 with ONE row: both old group-1 rows must go
    val reload = Seq((1L, 9, "z")).toDF("g", "i", "v")
    JdbcTable.store(reload, "t",
      DbConfig(strategy = DeleteInsert(Seq("g")), keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("g", "i", "v")).orderBy("g", "i")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(back.toSeq == Seq((1L, 9, "z"), (2L, 1, "c")))
    // keepContent=false: DELETE FROM target before applying
    JdbcTable.store(Seq((7L, 7, "only")).toDF("g", "i", "v"), "t",
      DbConfig(strategy = Append, keepContent = false),
      sf, dialect = SqlDialect.Derby)
    val after = readBack(url, "t", Seq("g", "i", "v")).collect()
    assert(after.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((7L, 7, "only")))
  }

  test("update-only MERGE updates matches and drops unmatched update rows") {
    val (url, sf) = freshDb()
    val df0 = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "n")
    createTarget(sf, "t", df0)
    JdbcTable.store(df0, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    // update v for key 2; key 99 has no target row -> dropped
    val upd = Seq((2L, "B!", 99), (99L, "nope", 1)).toDF("k", "v", "n")
    JdbcTable.store(upd, "t",
      DbConfig(strategy = UpdateOnly(Seq("k"), Seq("v")), keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("k", "v", "n")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // n is NOT a valueCol: key 2 keeps n=20
    assert(back.toSeq == Seq((1L, "a", 10), (2L, "B!", 20)))
  }

  test("apply failure rolls back the real transaction; resumable resumes from STAGED") {
    val (url, sf) = freshDb()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // target does NOT exist yet: staging succeeds, the apply INSERT fails,
    // and the one-txn apply must roll back leaving staging + registry intact
    val err = intercept[Exception] {
      JdbcTable.storeResumable(df, "t",
        DbConfig(strategy = Append, keepContent = true),
        sf, loadId = "L1", dialect = SqlDialect.Derby)
    }
    assert(err.getMessage != null)
    val s = sf()
    try {
      assert(s.query(SqlDialect.Derby.tableExistsSql.get,
        Seq("t_graft_stg_L1")).nonEmpty,
        "rollback must preserve the staged load for resume")
      assert(s.query(JdbcSql.selectStatus("graft_loads"), Seq("L1")) ==
        Seq(Seq("STAGED")), "registry must still say STAGED after rollback")
    } finally s.close()
    // heal the cause and resume with the SAME loadId: no restage, apply runs
    createTarget(sf, "t", df)
    JdbcTable.storeResumable(df, "t",
      DbConfig(strategy = Append, keepContent = true),
      sf, loadId = "L1", dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("k", "v")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "b")))
    val s2 = sf()
    try {
      assert(s2.query(JdbcSql.selectStatus("graft_loads"), Seq("L1")) ==
        Seq(Seq("APPLIED")))
      // re-invoking an APPLIED load is a no-op (exactly-once)
    } finally s2.close()
    JdbcTable.storeResumable(df, "t",
      DbConfig(strategy = Append, keepContent = true),
      sf, loadId = "L1", dialect = SqlDialect.Derby)
    assert(readBack(url, "t", Seq("k", "v")).count() == 2,
      "APPLIED re-invoke must not double-apply")
  }

  test("deleteKeys deletes by real batched keyed DELETE") {
    val (url, sf) = freshDb()
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    createTarget(sf, "t", df)
    JdbcTable.store(df, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    JdbcTable.deleteKeys(Seq(2L, 4L, 6L).toDF("k"), "t", Seq("k"), sf)
    val back = readBack(url, "t", Seq("k")).collect().map(_.getLong(0)).sorted
    assert(back.toSeq == Seq(1L, 3L, 5L, 7L, 8L, 9L, 10L))
  }

  test("execStatement drains a real multi-result-set Derby procedure") {
    val (url, _) = freshDb()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE nums (n INT)")
      st.execute("INSERT INTO nums VALUES (1), (2), (3)")
      st.execute(
        "CREATE PROCEDURE TWO_SETS() PARAMETER STYLE JAVA LANGUAGE JAVA " +
          "READS SQL DATA DYNAMIC RESULT SETS 2 " +
          s"EXTERNAL NAME '${classOf[DerbyProcs].getName}.twoSets'")
      st.close()
      val out = JdbcTable.execStatement(conn, "CALL TWO_SETS()")
      assert(out.size == 2, s"expected two result sets, got ${out.size}")
      assert(out(0).map(_("N")) == Seq(1, 2, 3))
      assert(out(1) == Seq(Map("C" -> 3)))
    } finally conn.close()
  }

  test("partitioned JDBC load range-reads a real Derby table in parallel") {
    val (url, sf) = freshDb()
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    createTarget(sf, "t", df)
    JdbcTable.store(df, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val back = JdbcTable.load(spark, url,
      """SELECT "id", "v" FROM "t"""",
      partitionColumn = Some(("id", 0L, 100L, 4)))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(sum("id")).head.getLong(0) == 4950L)
  }

  test("incremental upsert MERGE coalesces NULL staged fields against the target") {
    val (url, sf) = freshDb()
    val base = Seq((1L, Option("a"), Option(10L)), (2L, Option("b"), Option(20L)))
      .toDF("k", "v", "n")
    createTarget(sf, "t", base)
    JdbcTable.store(base, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val incoming = Seq(
      (1L, Option("A2"), None: Option[Long]),
      (2L, None: Option[String], Option(22L)),
      (3L, Option("c"), None: Option[Long])).toDF("k", "v", "n")
    JdbcTable.store(incoming, "t",
      DbConfig(strategy = Upsert(Seq("k")), keepContent = true,
        incrementalStore = true),
      sf, dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("k", "v", "n")).orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(back.toSeq == Seq(
      (1L, Some("A2"), Some(10L)),
      (2L, Some("b"), Some(22L)),
      (3L, Some("c"), None)))
  }

  test("insertIgnoreDups INSERT...WHERE NOT EXISTS skips present keys") {
    val (url, sf) = freshDb()
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    createTarget(sf, "t", base)
    JdbcTable.store(base, "t", DbConfig(strategy = Append, keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val incoming = Seq((2L, "LOSES"), (3L, "first"), (3L, "second"))
      .toDF("k", "v").coalesce(1)
    JdbcTable.store(incoming, "t",
      DbConfig(strategy = InsertIgnoreDups(Seq("k")), keepContent = true),
      sf, dialect = SqlDialect.Derby)
    val back = readBack(url, "t", Seq("k", "v")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "first")))
  }

  test("data error surfaces the offending row's debugKeyIndicator keys") {
    // the reference's Datenfehler leg (t/DB.t: ID0 varchar(4) fed
    // 'ABCD_WayTooLongField' with debugKeyIndicator 'selDate=? ID1=?'):
    // a too-narrow column rejects one row and the error must NAME the
    // offending record's keys, not just Derby's truncation code
    val (_, sf) = freshDb()
    val df = Seq((1L, "ok"), (2L, "also"), (3L, "waytoolongvalue"))
      .toDF("k", "v").coalesce(1)
    val narrow = SqlDialect.Derby.copy(stringType = "VARCHAR(8)")
    createTarget(sf, "t", df)
    val err = intercept[Exception] {
      JdbcTable.store(df, "t",
        DbConfig(strategy = Append, keepContent = true,
          debugKeyIndicator = "k=?"),
        sf, dialect = narrow)
    }
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("k=3"),
      s"error must carry the offending row's key context, got: $messages")
  }
}

/** Java-procedure body for the Derby multi-result-set test: Derby invokes
  * the STATIC forwarder `DerbyProcs.twoSets` (Scala emits it for the
  * companion object's method), passing one ResultSet[] per declared
  * dynamic result set; the nested query runs on the caller's connection
  * (`jdbc:default:connection`). */
class DerbyProcs
object DerbyProcs {
  def twoSets(rs1: Array[java.sql.ResultSet],
              rs2: Array[java.sql.ResultSet]): Unit = {
    val conn = java.sql.DriverManager.getConnection("jdbc:default:connection")
    rs1(0) = conn.createStatement()
      .executeQuery("SELECT n FROM nums ORDER BY n")
    rs2(0) = conn.createStatement()
      .executeQuery("SELECT COUNT(*) AS c FROM nums")
  }
}
