package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * on SPARK_GRAFT_SF_DIR. Each query gets one warm-up execution (JIT +
  * codegen + file-listing caches), then the minimum of two timed runs;
  * results are forced through the noop sink so the full plan executes
  * (count() can elide sorts/projections).
  *
  * The record defends itself against co-tenant noise (round 3 recorded a
  * 9.9 s entry that re-timed quiet at 1.1 s): the 1-minute loadavg is
  * sampled before every timed run and recorded per query, and any query
  * whose best run was measured under load above [[Bench.LoadThresh]] is
  * re-timed at the end of the suite (up to two extra runs, min kept) —
  * by then the burst has usually passed, and if it hasn't, the recorded
  * per-query load says so. A decision (like the driver's 2× gate) should
  * trust entries with low recorded load and re-time the rest.
  */
object Bench {

  /** 1-minute loadavg above which a measurement is considered
    * noise-suspect on this container (quiet runs sit well under 1). */
  val LoadThresh = 2.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load1(): Double = try {
      scala.io.Source.fromFile("/proc/loadavg").getLines().next()
        .split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }

    def execute(name: String): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    /** One timed run; the load sample is taken BEFORE the run so it
      * reflects pressure the run started under. */
    def timed(name: String): (Double, Double) = {
      val l = load1()
      (execute(name), l)
    }

    // measurement state per query: best secs + load of the best run
    final case class M(secs: Double, load: Double, retimes: Int)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, M]

    // SPARK_GRAFT_ONLY=q20_...,q21_... benches a subset (scale smokes)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        execute(name) // warm-up (not timed)
        val a = timed(name)
        val b = timed(name)
        val best = if (a._1 <= b._1) a else b
        results(name) = M(best._1, best._2, 0)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        results(name) = M(-1.0, -1.0, 0)
      } finally {
        // operators that cache intermediate relations register a fresh
        // cache entry per execution — drop them so later queries don't
        // fight orphaned storage memory
        spark.catalog.clearCache()
      }
    }

    // defense pass: re-time every query whose best run started under
    // load — the burst has usually passed by the end of the suite
    names.foreach { name =>
      val m = results(name)
      if (m.secs >= 0 && m.load > LoadThresh) {
        var cur = m
        var tries = 0
        while (tries < 2 && cur.load > LoadThresh) {
          tries += 1
          try {
            val (s, l) = timed(name)
            // keep the faster measurement; its load tags its credibility.
            // A QUIET re-run that is slower still vindicates the record:
            // load only ever inflates a run, so a quiet run bracketing
            // the kept minimum proves the minimum wasn't noise — record
            // the quiet load so downstream consumers trust the entry.
            if (s < cur.secs) cur = M(s, l, tries)
            // l = -1.0 means the load read itself failed — that is not
            // a quiet run and must not unflag a suspect entry
            else if (l >= 0) cur = M(cur.secs, math.min(cur.load, l), tries)
            else cur = cur.copy(retimes = tries)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] retime $name failed: ${e.getMessage}")
            tries = 2
          } finally spark.catalog.clearCache()
        }
        results(name) = cur
      }
    }

    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma decimal separator would corrupt the JSON record
    def fmt(d: Double): String =
      if (d.isNaN) "-1"
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val qs = results.map { case (k, m) => "\"" + k + "\":" + fmt(m.secs) }
      .mkString("{", ",", "}")
    val loads = results.map { case (k, m) => "\"" + k + "\":" + fmt(m.load) }
      .mkString("{", ",", "}")
    val retimed = results.collect { case (k, m) if m.retimes > 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.map(_.secs).filter(_ >= 0).sum
    // machine load at bench end: co-tenant CPU bursts can inflate wall
    // times several-fold, so the record carries its own noise diagnostic
    val load = try {
      scala.io.Source.fromFile("/proc/loadavg").getLines().next().split(" ").take(3).mkString(",")
    } catch { case _: Throwable => "" }
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""query_load":$loads,"retimed":$retimed,"sf":"$sfDir","loadavg":"$load"}"""
    // sbt interleaves [info]/WARN prefixes on stdout, which broke the
    // driver's parse in round 1 — persist the result line to a file too
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
