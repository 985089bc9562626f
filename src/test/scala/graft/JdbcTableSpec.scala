package graft

import graft.pipeline.Config._
import graft.sinks.{JdbcSql, JdbcTable}
import org.scalatest.funsuite.AnyFunSuite

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Hermetic verification of the JDBC sink twin: no DBMS exists in this
  * container, so (a) the real [[JdbcTable.ConnectionSession]] batching
  * loop runs against java.sql dynamic proxies, and (b) the store
  * orchestration runs against a recording session asserting emitted SQL
  * and transaction order. The production DriverManager path differs only
  * in who hands out the Connection. */
object RecordingJdbc {
  val events = new ConcurrentLinkedQueue[String]()
  def clear(): Unit = events.clear()
  def list: Seq[String] = events.asScala.toSeq

  class Session(failOnPrefix: String,
                queryFn: String => Seq[Seq[Any]]) extends JdbcTable.JdbcSession {
    def execute(sql: String): Unit = {
      if (failOnPrefix.nonEmpty && sql.startsWith(failOnPrefix))
        throw new RuntimeException(s"boom on: $sql")
      events.add(s"execute:$sql")
    }
    def executeBatch(sql: String, rows: Iterator[Seq[Any]], batchSize: Int): Long = {
      val n = rows.size
      events.add(s"batch:$sql|rows=$n|batchSize=$batchSize")
      n
    }
    def query(sql: String, params: Seq[Any]): Seq[Seq[Any]] = {
      events.add(s"query:$sql|params=${params.mkString(",")}")
      queryFn(sql)
    }
    def commit(): Unit = events.add("commit")
    def rollback(): Unit = events.add("rollback")
    def close(): Unit = events.add("close")
  }

  def factory(failOnPrefix: String = "",
              queryFn: String => Seq[Seq[Any]] = _ => Nil): JdbcTable.SessionFactory =
    () => new Session(failOnPrefix, queryFn)
}

class JdbcTableSpec extends SparkSpec {
  import spark.implicits._

  // ---- real ConnectionSession against java.sql proxies ----------------

  private def proxyPair(): (java.sql.Connection, ConcurrentLinkedQueue[String]) = {
    val calls = new ConcurrentLinkedQueue[String]()
    lazy val ps: java.sql.PreparedStatement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "setObject"    => calls.add(s"setObject(${args(0)})"); null
          case "addBatch"     => calls.add("addBatch"); null
          case "executeBatch" => calls.add("executeBatch"); Array.empty[Int]
          case "close"        => calls.add("ps.close"); null
          case _              => null
        }
      }).asInstanceOf[java.sql.PreparedStatement]
    val st: java.sql.Statement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "execute" => calls.add(s"execute(${args(0)})"); java.lang.Boolean.FALSE
          case "close"   => null
          case _         => null
        }
      }).asInstanceOf[java.sql.Statement]
    val conn: java.sql.Connection = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => calls.add(s"prepare(${args(0)})"); ps
          case "createStatement"  => st
          case "setAutoCommit"    => calls.add(s"autoCommit(${args(0)})"); null
          case "commit"           => calls.add("commit"); null
          case "rollback"         => calls.add("rollback"); null
          case "close"            => calls.add("conn.close"); null
          case _                  => null
        }
      }).asInstanceOf[java.sql.Connection]
    (conn, calls)
  }

  test("ConnectionSession flushes executeBatch at batchSize boundaries") {
    val (conn, calls) = proxyPair()
    val s = new JdbcTable.ConnectionSession(conn)
    val rows = (1 to 7).iterator.map(i => Seq[Any](i, s"v$i"))
    val n = s.executeBatch("INSERT INTO t VALUES (?, ?)", rows, batchSize = 3)
    s.commit(); s.close()
    val cs = calls.asScala.toSeq
    assert(n == 7)
    assert(cs.head == "autoCommit(false)") // txn bracket: autocommit off
    assert(cs.count(_ == "addBatch") == 7)
    assert(cs.count(_ == "executeBatch") == 3) // 3 + 3 + 1
    assert(cs.count(_.startsWith("setObject")) == 14)
    // last flush happens before close, commit after flushes
    assert(cs.indexOf("commit") > cs.lastIndexOf("executeBatch"))
    assert(cs.contains("ps.close") && cs.last == "conn.close")
  }

  // ---- SQL generation --------------------------------------------------

  test("upsert compiles to one ANSI MERGE with update+insert arms") {
    val Seq(merge) = JdbcSql.applyStatements(Upsert(Seq("k")), "tgt", "stg",
      Seq("k", "a", "b"))
    assert(merge ==
      """MERGE INTO "tgt" USING "stg" ON "tgt"."k" = "stg"."k" """ +
      """WHEN MATCHED THEN UPDATE SET "a" = "stg"."a", "b" = "stg"."b" """ +
      """WHEN NOT MATCHED THEN INSERT ("k", "a", "b") VALUES ("stg"."k", "stg"."a", "stg"."b")""")
  }

  test("delete-insert compiles to keyed DELETE then INSERT SELECT") {
    val stmts = JdbcSql.applyStatements(DeleteInsert(Seq("k1", "k2")), "tgt",
      "stg", Seq("k1", "k2", "v"))
    assert(stmts == Seq(
      """DELETE FROM "tgt" WHERE EXISTS (SELECT 1 FROM "stg" """ +
        """WHERE "tgt"."k1" = "stg"."k1" AND "tgt"."k2" = "stg"."k2")""",
      """INSERT INTO "tgt" ("k1", "k2", "v") SELECT "k1", "k2", "v" FROM "stg""""))
  }

  test("update-only MERGE has no insert arm; identifiers escape quotes") {
    val Seq(merge) = JdbcSql.applyStatements(
      UpdateOnly(Seq("k"), Seq("""we"ird""")), "tgt", "stg", Seq("k", """we"ird"""))
    assert(merge.contains("""WHEN MATCHED THEN UPDATE SET "we""ird" = "stg"."we""ird""""))
    assert(!merge.contains("NOT MATCHED"))
  }

  test("staging DDL maps Spark types to ANSI and keeps ? placeholders") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("dec", DecimalType(18, 2)),
      StructField("s", StringType), StructField("ts", TimestampType,
        nullable = false)))
    assert(JdbcSql.createTable("t_stg", schema) ==
      """CREATE TABLE "t_stg" ("i" INTEGER, "l" BIGINT, "d" DOUBLE PRECISION, """ +
      """"dec" DECIMAL(18,2), "s" VARCHAR, "ts" TIMESTAMP NOT NULL)""")
    assert(JdbcSql.insert("t", Seq("a", "b")) ==
      """INSERT INTO "t" ("a", "b") VALUES (?, ?)""")
  }

  // ---- store orchestration --------------------------------------------

  private def storeEvents(db: DbConfig, df: org.apache.spark.sql.DataFrame,
                          failOnPrefix: String = ""): Seq[String] = {
    RecordingJdbc.clear()
    JdbcTable.store(df, "tgt", db, RecordingJdbc.factory(failOnPrefix),
      batchSize = 2)
    RecordingJdbc.list
  }

  test("append store: create staging, stage partitions, apply in one txn") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v").repartition(1)
    val ev = storeEvents(DbConfig(strategy = Append, keepContent = true), df)
    val setup = ev.takeWhile(!_.startsWith("batch"))
    assert(setup == Seq(
      """execute:DROP TABLE IF EXISTS "tgt_graft_stg"""",
      """execute:CREATE TABLE "tgt_graft_stg" ("k" INTEGER NOT NULL, "v" VARCHAR, """ +
        """"_graft_part" INTEGER NOT NULL)""",
      "commit", "close"))
    // each partition task: delete own part rows (retry idempotency), insert
    val batches = ev.filter(_.startsWith("batch"))
    assert(batches == Seq(
      """batch:DELETE FROM "tgt_graft_stg" WHERE "_graft_part" = ?|rows=1|batchSize=1""",
      """batch:INSERT INTO "tgt_graft_stg" ("k", "v", "_graft_part") VALUES (?, ?, ?)|rows=3|batchSize=2"""))
    // apply phase: strictly after staging, one commit, drops staging
    val apply = ev.drop(ev.lastIndexWhere(_.startsWith("batch")) + 2) // skip batch+its commit
    assert(apply.filter(_.startsWith("execute")) == Seq(
      """execute:INSERT INTO "tgt" ("k", "v") SELECT "k", "v" FROM "tgt_graft_stg"""",
      """execute:DROP TABLE "tgt_graft_stg""""))
    assert(apply.count(_ == "commit") == 1 && !apply.contains("rollback"))
  }

  test("truncate (keepContent=false) deletes target before applying") {
    val df = Seq((1, "a")).toDF("k", "v").repartition(1)
    val ev = storeEvents(DbConfig(strategy = Append, keepContent = false), df)
    val applyExecs = ev.drop(ev.lastIndexWhere(_.startsWith("batch")) + 1)
      .filter(_.startsWith("execute"))
    assert(applyExecs.head == """execute:DELETE FROM "tgt"""")
  }

  test("upsert store dedupes last-wins before staging and emits MERGE") {
    // key 1 appears twice; later _lineno must win → 2 staged rows
    val df = Seq((1, "old", 0L), (1, "new", 1L), (2, "x", 2L))
      .toDF("k", "v", "_lineno").repartition(1)
    val ev = storeEvents(
      DbConfig(strategy = Upsert(Seq("k")), keepContent = true), df)
    val batch = ev.filter(_.startsWith("batch:INSERT"))
    assert(batch.size == 1 && batch.head.contains("rows=2"),
      s"expected 2 deduped staged rows, got: $batch")
    assert(ev.exists(e => e.startsWith("execute:MERGE INTO \"tgt\"") &&
      e.contains("WHEN NOT MATCHED")))
  }

  test("addID constants are staged as columns") {
    val df = Seq((1, "a")).toDF("k", "v").repartition(1)
    val ev = storeEvents(DbConfig(strategy = Append, keepContent = true,
      addID = Map("load_id" -> "L42")), df)
    assert(ev.exists(_.contains(""""k" INTEGER NOT NULL, "v" VARCHAR, "load_id" VARCHAR""")))
    assert(ev.exists(_.contains(""""k", "v", "load_id", "_graft_part") VALUES (?, ?, ?, ?)""")))
  }

  test("apply-phase failure rolls back and skips the staging drop") {
    val df = Seq((1, "a")).toDF("k", "v").repartition(1)
    RecordingJdbc.clear()
    // fail on the INSERT INTO "tgt" apply statement
    val err = intercept[RuntimeException] {
      JdbcTable.store(df, "tgt",
        DbConfig(strategy = Append, keepContent = true),
        RecordingJdbc.factory(failOnPrefix = "INSERT INTO \"tgt\" "),
        batchSize = 2)
    }
    assert(err.getMessage.startsWith("boom"))
    val ev = RecordingJdbc.list
    assert(ev.contains("rollback"))
    assert(!ev.exists(_.startsWith("""execute:DROP TABLE "tgt_graft_stg"""")))
    assert(ev.last == "close") // connection released even on failure
  }

  // ---- resumable load-id protocol -------------------------------------

  test("resumable store: fresh load runs registry → stage → STAGED → apply+APPLIED") {
    RecordingJdbc.clear()
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v").repartition(1)
    JdbcTable.storeResumable(df, "tgt",
      DbConfig(strategy = Append, keepContent = true),
      RecordingJdbc.factory(), loadId = "L1", batchSize = 10)
    val ev = RecordingJdbc.list
    // boot: ensure registry, read status
    assert(ev.head.startsWith("""execute:CREATE TABLE IF NOT EXISTS "graft_loads""""))
    assert(ev.exists(_.startsWith(
      """query:SELECT "status" FROM "graft_loads" WHERE "load_id" = ?|params=L1""")))
    // registry row written as STAGING before any staging insert
    val regIns = ev.indexWhere(_.startsWith(
      """batch:INSERT INTO "graft_loads" ("load_id", "target", "status")"""))
    val stgIns = ev.indexWhere(_.startsWith("""batch:INSERT INTO "tgt_graft_stg_L1""""))
    assert(regIns >= 0 && stgIns > regIns)
    // staging table carries the load id
    assert(ev.exists(_.startsWith("""execute:CREATE TABLE "tgt_graft_stg_L1"""")))
    // STAGED marker after staging, before the apply transaction
    val staged = ev.indexWhere(_.startsWith(
      """batch:UPDATE "graft_loads" SET "status" = ? WHERE "load_id" = ?|rows=1"""))
    val applyIns = ev.indexWhere(_.startsWith("""execute:INSERT INTO "tgt" """))
    assert(staged > stgIns && applyIns > staged)
    // APPLIED marker + staging drop ride the apply transaction (before its commit)
    val applied = ev.lastIndexWhere(_.startsWith(
      """batch:UPDATE "graft_loads" SET "status" = ?"""))
    val drop = ev.indexWhere(_ == """execute:DROP TABLE "tgt_graft_stg_L1"""")
    assert(applied > applyIns && drop > applied)
    assert(ev.indexOf("commit", applied) > drop) // same txn commits after both
  }

  test("resumable store resumes from STAGED: no restaging, straight to apply") {
    RecordingJdbc.clear()
    val df = Seq((1, "a")).toDF("k", "v").repartition(1)
    JdbcTable.storeResumable(df, "tgt",
      DbConfig(strategy = Append, keepContent = true),
      RecordingJdbc.factory(queryFn = _ => Seq(Seq("STAGED"))), loadId = "L2")
    val ev = RecordingJdbc.list
    assert(!ev.exists(_.startsWith("""execute:CREATE TABLE "tgt_graft_stg""")),
      "STAGED resume must not rebuild staging")
    assert(!ev.exists(_.startsWith("""batch:INSERT INTO "tgt_graft_stg""")),
      "STAGED resume must not restage rows")
    assert(ev.exists(_.startsWith(
      """execute:INSERT INTO "tgt" ("k", "v") SELECT "k", "v" FROM "tgt_graft_stg_L2"""")))
    assert(ev.exists(_ == """execute:DROP TABLE "tgt_graft_stg_L2""""))
  }

  test("resumable store restages from scratch on a partial STAGING state") {
    RecordingJdbc.clear()
    val df = Seq((1, "a")).toDF("k", "v").repartition(1)
    JdbcTable.storeResumable(df, "tgt",
      DbConfig(strategy = Append, keepContent = true),
      RecordingJdbc.factory(queryFn = _ => Seq(Seq("STAGING"))), loadId = "L4")
    val ev = RecordingJdbc.list
    // the half-staged table is dropped and rebuilt, rows restaged
    assert(ev.exists(_ == """execute:DROP TABLE IF EXISTS "tgt_graft_stg_L4""""))
    assert(ev.exists(_.startsWith("""execute:CREATE TABLE "tgt_graft_stg_L4"""")))
    assert(ev.exists(_.startsWith("""batch:INSERT INTO "tgt_graft_stg_L4"""")))
    // and the full marker sequence still runs: STAGED then APPLIED
    val updates = ev.filter(_.startsWith("""batch:UPDATE "graft_loads""""))
    assert(updates.size == 2, s"expected STAGED+APPLIED updates, got $updates")
  }

  test("resumable store is a no-op when the load is already APPLIED") {
    RecordingJdbc.clear()
    val df = Seq((1, "a")).toDF("k", "v").repartition(1)
    JdbcTable.storeResumable(df, "tgt",
      DbConfig(strategy = Append, keepContent = false),
      RecordingJdbc.factory(queryFn = _ => Seq(Seq("APPLIED"))), loadId = "L3")
    val ev = RecordingJdbc.list
    // only the boot session: ensure registry + status read, nothing else
    assert(ev.count(_.startsWith("execute:")) == 1)
    assert(!ev.exists(_.startsWith("batch:")))
    assert(!ev.exists(_.contains("DELETE FROM \"tgt\"")),
      "APPLIED no-op must not truncate the target")
  }

  test("ConnectionSession.query binds params and drains the result set") {
    val calls = new ConcurrentLinkedQueue[String]()
    val rows = Seq(Seq[Any]("STAGED"))
    var idx = -1
    val md = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.ResultSetMetaData]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getColumnCount" => Int.box(1)
          case _                => null
        }
      }).asInstanceOf[java.sql.ResultSetMetaData]
    val rs = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.ResultSet]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getMetaData" => md
          case "next"        => idx += 1; java.lang.Boolean.valueOf(idx < rows.length)
          case "getObject"   => rows(idx)(args(0).asInstanceOf[Int] - 1).asInstanceOf[AnyRef]
          case _             => null
        }
      }).asInstanceOf[java.sql.ResultSet]
    val ps = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.PreparedStatement]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "setObject"    => calls.add(s"setObject(${args(0)},${args(1)})"); null
          case "executeQuery" => calls.add("executeQuery"); rs
          case "close"        => null
          case _              => null
        }
      }).asInstanceOf[java.sql.PreparedStatement]
    val conn = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => ps
          case "setAutoCommit"    => null
          case _                  => null
        }
      }).asInstanceOf[java.sql.Connection]
    val out = new JdbcTable.ConnectionSession(conn).query("SELECT s FROM r WHERE id = ?", Seq("L1"))
    assert(calls.asScala.toSeq == Seq("setObject(1,L1)", "executeQuery"))
    assert(out == Seq(Seq("STAGED")))
  }

  test("execStatement drains multiple result sets (odbc_more_results loop)") {
    // simulate a procedure returning TWO result sets: [(a=1),(a=2)] then [(b="x")]
    def rsProxy(cols: Seq[String], rows: Seq[Seq[Any]]): java.sql.ResultSet = {
      var idx = -1
      val md = Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.ResultSetMetaData]), new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "getColumnCount" => Int.box(cols.length)
            case "getColumnLabel" => cols(args(0).asInstanceOf[Int] - 1)
            case _                => null
          }
        }).asInstanceOf[java.sql.ResultSetMetaData]
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.ResultSet]), new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "getMetaData" => md
            case "next"        => idx += 1; java.lang.Boolean.valueOf(idx < rows.length)
            case "getObject"   =>
              rows(idx)(cols.indexOf(args(0).asInstanceOf[String])).asInstanceOf[AnyRef]
            case _             => null
          }
        }).asInstanceOf[java.sql.ResultSet]
    }
    val sets = Iterator(
      rsProxy(Seq("a"), Seq(Seq(1), Seq(2))),
      rsProxy(Seq("b"), Seq(Seq("x"))))
    var current: java.sql.ResultSet = null
    var remaining = 2
    val calls = new ConcurrentLinkedQueue[String]()
    val ps = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.PreparedStatement]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "setObject" => calls.add(s"setObject(${args(0)},${args(1)})"); null
          case "execute" =>
            current = sets.next(); remaining -= 1; java.lang.Boolean.TRUE
          case "getResultSet" => current
          case "getMoreResults" =>
            if (remaining > 0) { current = sets.next(); remaining -= 1; java.lang.Boolean.TRUE }
            else { current = null; java.lang.Boolean.FALSE }
          case "getUpdateCount" => Int.box(-1)
          case "close"          => null
          case _                => null
        }
      }).asInstanceOf[java.sql.PreparedStatement]
    val conn = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Connection]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => ps
          case _                  => null
        }
      }).asInstanceOf[java.sql.Connection]
    val out = JdbcTable.execStatement(conn, "EXEC two_sets ?", Seq(42))
    assert(calls.asScala.toSeq == Seq("setObject(1,42)"))
    assert(out == Seq(
      Seq(Map("a" -> 1), Map("a" -> 2)),
      Seq(Map("b" -> "x"))))
  }

  test("deleteKeys emits batched keyed DELETE") {
    RecordingJdbc.clear()
    val keys = Seq((1, "x"), (2, "y")).toDF("k", "other").repartition(1)
    JdbcTable.deleteKeys(keys, "tgt", Seq("k"), RecordingJdbc.factory(), 10)
    val ev = RecordingJdbc.list
    assert(ev.head == """batch:DELETE FROM "tgt" WHERE "k" = ?|rows=2|batchSize=10""")
    assert(ev.tail == Seq("commit", "close"))
  }

  // ---- real spark.read.format("jdbc") path against the stub driver ----

  test("partitioned JDBC load wraps the query as a derived table") {
    StubJdbcDriver.register()
    StubJdbcDriver.queries.clear()
    // `query` + `partitionColumn` is rejected by Spark's JDBC source — the
    // partitioned path must go through `dbtable` with the SQL as a
    // derived table, or the stated point of the API (parallel range
    // reads) always throws
    val df = JdbcTable.load(spark, "jdbc:graftstub:mem",
      "SELECT id, v FROM t", partitionColumn = Some(("id", 0L, 100L, 4)))
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 0) // per-partition range queries hit the stub
    val qs = StubJdbcDriver.queries.asScala.toSeq
    assert(qs.exists(_.contains("(SELECT id, v FROM t) graft_subq")),
      s"expected derived-table SQL, saw: $qs")
  }

  test("unpartitioned JDBC load keeps the single-reader query option") {
    StubJdbcDriver.register()
    val df = JdbcTable.load(spark, "jdbc:graftstub:mem", "SELECT id, v FROM t")
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(df.rdd.getNumPartitions == 1)
  }
}

/** Minimal in-JVM JDBC driver (url scheme `jdbc:graftstub:`) answering
  * exactly what Spark's JDBC source needs: every query resolves to
  * (id BIGINT, v VARCHAR) with zero rows. Lets the REAL
  * `spark.read.format("jdbc")` path — option validation, schema probe,
  * column partitioning, per-partition range reads — run hermetically in a
  * container with no DBMS. Must be a named top-level class: Spark
  * re-registers the driver on executors via its canonical class name. */
class StubJdbcDriver extends java.sql.Driver {

  private def mk[T](cls: Class[T])(h: (String, Array[AnyRef]) => Option[AnyRef]): T =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(cls),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          h(m.getName, if (args == null) Array.empty else args).getOrElse {
            m.getReturnType match {
              case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
              case java.lang.Integer.TYPE => Integer.valueOf(0)
              case java.lang.Long.TYPE    => java.lang.Long.valueOf(0L)
              case _                      => null
            }
          }
      }).asInstanceOf[T]

  private def meta: java.sql.ResultSetMetaData =
    mk(classOf[java.sql.ResultSetMetaData]) { (name, args) =>
      def first = args.nonEmpty && args(0) == Integer.valueOf(1)
      name match {
        case "getColumnCount" => Some(Integer.valueOf(2))
        case "getColumnLabel" | "getColumnName" => Some(if (first) "id" else "v")
        case "getColumnType" => Some(Integer.valueOf(
          if (first) java.sql.Types.BIGINT else java.sql.Types.VARCHAR))
        case "getColumnTypeName" => Some(if (first) "BIGINT" else "VARCHAR")
        case "getPrecision" => Some(Integer.valueOf(if (first) 19 else 255))
        case "isSigned" => Some(java.lang.Boolean.TRUE)
        case "isNullable" =>
          Some(Integer.valueOf(java.sql.ResultSetMetaData.columnNullable))
        case _ => None
      }
    }

  private def resultSet: java.sql.ResultSet =
    mk(classOf[java.sql.ResultSet]) { (name, _) =>
      name match {
        case "getMetaData" => Some(meta)
        case "next"        => Some(java.lang.Boolean.FALSE)
        case _             => None
      }
    }

  private def statement: java.sql.PreparedStatement =
    mk(classOf[java.sql.PreparedStatement]) { (name, _) =>
      name match {
        case "executeQuery" => Some(resultSet)
        case "getMetaData"  => Some(meta)
        case _              => None
      }
    }

  private def connection: java.sql.Connection =
    mk(classOf[java.sql.Connection]) { (name, args) =>
      name match {
        case "prepareStatement" | "createStatement" =>
          if (args.nonEmpty) StubJdbcDriver.queries.add(args(0).toString)
          Some(statement)
        case _ => None
      }
    }

  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) connection else null
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:graftstub:")
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}

object StubJdbcDriver {
  val queries = new ConcurrentLinkedQueue[String]()
  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(new StubJdbcDriver)
      registered = true
    }
  }
}
