package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet uses TIMESTAMP(NANOS); read as long, converted back
      // to a timestamp in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // candidate-id pushdown (Dedup.lshJudgeChunk): let bounded IN
      // lists reach the parquet reader as OR-of-equals so id-sorted
      // files page-skip, instead of the default-10 cutoff
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Every declared query gets a recorded outcome — a failure must surface
    // as an `err` entry in errors.json, never as a silently-missing row in
    // the round's correctness record (a silent omission cost two rounds of
    // signal when the events family broke).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // The ~200-gate surface runs MULTI-THREADED: Spark job submission is
    // thread-safe, and a sequential sweep leaves most of the cluster idle
    // between one query's stages (round 9's official verify produced an
    // empty record — a sequential ~6-minute sweep on a loaded box is the
    // prime suspect for overrunning the driver's window). Each worker gets
    // its OWN spark.newSession(): shared SparkContext, isolated SQL conf
    // and temp-view catalog, so a gate that flips a session conf (e.g.
    // ParquetTable's partitionOverwriteMode bracket) or registers views
    // cannot race a concurrent gate.
    val work = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    // A malformed override must not abort the sweep before any gate runs
    // (an aborted sweep IS the empty-correctness failure this parallel
    // path exists to prevent) — fall back to the default and warn.
    val nThreads = math.max(1,
      sys.env.get("SPARK_GRAFT_VERIFY_THREADS") match {
        case Some(v) => scala.util.Try(v.toInt).getOrElse {
          System.err.println(
            s"[verify] SPARK_GRAFT_VERIFY_THREADS='$v' is not an int; using 4")
          4
        }
        case None => 4
      })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val tasks = work.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try fn(spark.newSession(), sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            System.err.println(s"[verify] $name failed: $msg")
            errors.synchronized { errors(name) = msg.take(500) }
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
