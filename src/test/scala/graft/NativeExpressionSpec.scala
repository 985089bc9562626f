package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

/** Native Catalyst expressions: codegen and interpreted paths must agree
  * with the pure-Scala Coerce implementations, and SQL registration must
  * work both via install() and the extensions conf. */
class NativeExpressionSpec extends SparkSpec {

  test("native expressions agree with Coerce on a value battery") {
    import spark.implicits._
    val inputs = Seq("22.123.123,013", "17E2", "123-", "12%", "N/A", "x", "1,5",
      "02.01.1995", "19950102123456", "02.01.95", "garbage", null)
    val df = inputs.toDF("s")
    val out = df.select(
      col("s"),
      GraftExtensions.normalize_numerics(col("s"), ".", ",").as("norm"),
      GraftExtensions.coerce_numeric(
        GraftExtensions.normalize_numerics(col("s"), ".", ",")).as("num"),
      GraftExtensions.coerce_datetime(col("s")).as("dt"))
    val rows = out.collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val expNorm = if (s == null) null else graft.functions.Coerce.normalizeNumerics(s, ".", ",")
      val expNum = if (s == null) None else graft.functions.Coerce.coerceNumeric(expNorm)
      val expDt = if (s == null) None else graft.functions.Coerce.coerceDateTime(s)
      assert(Option(r.getString(1)) == Option(expNorm), s"norm($s)")
      assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) == expNum, s"num($s)")
      assert(Option(r.getString(3)) == expDt.orElse(None) ||
        (r.isNullAt(3) && expDt.isEmpty), s"dt($s)")
    }
  }

  test("native coerce_bool agrees with the Coerce implementation") {
    import spark.implicits._
    val inputs = Seq("WAHR", "FALSCH", "true", "FALSE", "0", "1", "ja", "x",
      " wahr ", "", null)
    val rows = inputs.toDF("s")
      .select(col("s"), GraftExtensions.coerce_bool(col("s")).as("b"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val want = if (s == null) None else graft.functions.Coerce.coerceBool(s)
      val got = if (r.isNullAt(1)) None else Some(r.getBoolean(1))
      assert(got == want, s"coerce_bool($s)")
    }
  }

  test("native char_ngrams agrees with the declarative substr formulation") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    val docs = Seq("The  quick Brown fox", "ab", "a", "", "  x  y  z ",
      "Ümläute ßtraße", "tab\there\nnewline").toDF("t")
    val native = GraftColumnBridge.column(graft.plans.CharNgrams(
      GraftColumnBridge.expression(col("t")), 2))
    val norm = regexp_replace(lower(trim(col("t"))), "\\s+", " ")
    val decl = when(length(norm) >= 2,
        transform(sequence(lit(1), length(norm) - 1), i => norm.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(native.as("a"), decl.as("b")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("codegen path actually compiles (no fallback exception)") {
    import spark.implicits._
    // wide enough to force whole-stage codegen through the expression
    val df = (1 to 1000).map(i => s"$i,5").toDF("s")
    val sum = df.select(GraftExtensions.coerce_numeric(
      GraftExtensions.normalize_numerics(col("s"), ".", ",")).as("v"))
      .agg(org.apache.spark.sql.functions.sum("v")).head().getDouble(0)
    assert(sum == (1 to 1000).map(i => i + 0.5).sum)
  }

  test("new native expressions compile under codegen with fallback disabled") {
    import spark.implicits._
    import graft.operators.{Dedup, TextOps}
    import org.apache.spark.sql.GraftColumnBridge
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = (1 to 100).map(i => s"doc $i the quick brown fox").toDF("t")
      val sketch = GraftColumnBridge.column(graft.plans.WinnowSketch(
        GraftColumnBridge.expression(col("t")), 4, 3))
      val ngrams = GraftColumnBridge.column(graft.plans.TokenNgrams(
        GraftColumnBridge.expression(split(col("t"), " ")), 2))
      val r = df.select(
          TextOps.matchCount(col("t"), Seq("the", "fox")).cast("long").as("mc"),
          Dedup.polyHash(col("t")).as("ph"),
          org.apache.spark.sql.functions.size(Dedup.shingles(col("t"), 3))
            .cast("long").as("ns"),
          org.apache.spark.sql.functions.size(sketch).cast("long").as("nw"),
          org.apache.spark.sql.functions.size(ngrams).cast("long").as("ng"))
        .agg(org.apache.spark.sql.functions.sum("mc"),
          org.apache.spark.sql.functions.min("ph"),
          org.apache.spark.sql.functions.min("ns"),
          org.apache.spark.sql.functions.min("nw"),
          org.apache.spark.sql.functions.min("ng")).head()
      assert(r.getLong(0) == 200) // 2 marker hits × 100 rows
      assert(r.getLong(2) > 0 && r.getLong(3) > 0 && r.getLong(4) > 0)

      // VecFold through a real aggregate pipeline (dot + squared L2)
      val vdf = (1 to 100).map(i => (Seq(i.toFloat, 2f, 3f), Seq(1f, i.toFloat, 1f)))
        .toDF("a", "b")
      def vf(sq: Boolean) = GraftColumnBridge.column(graft.plans.VecFold(
        GraftColumnBridge.expression(col("a")),
        GraftColumnBridge.expression(col("b")), sq))
      val v = vdf.select(vf(false).as("d"), vf(true).as("s"))
        .agg(org.apache.spark.sql.functions.sum("d"),
          org.apache.spark.sql.functions.sum("s")).head()
      assert(v.getDouble(0) == (1 to 100).map(i => i * 1.0 + 2.0 * i + 3.0).sum)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("SQL registration via install()") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT coerce_numeric(normalize_numerics('1.234,5', '.', ',')) AS v, " +
      "coerce_datetime('02.01.95') AS dt").head()
    assert(r.getDouble(0) == 1234.5)
    assert(r.getString(1) == "1995-01-02 00:00:00")
  }

  test("ArrayMinAgg folds element-wise minima with partial aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.{col, typedlit, transform => tf}
    val df = Seq((1, Seq(5L, 1L, 9L)), (1, Seq(3L, 7L, 2L)), (1, Seq(4L, 4L, 4L)),
                 (2, Seq(10L, 20L, 30L)))
      .toDF("id", "arr").repartition(3) // multiple partitions → merge path runs
    val agg = GraftColumnBridge.column(
      graft.plans.ArrayMinAgg(GraftColumnBridge.expression(col("arr")), 3)
        .toAggregateExpression())
    val got = df.groupBy("id").agg(agg.as("sig")).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(got.toSeq == Seq((1, Seq(3L, 1L, 2L)), (2, Seq(10L, 20L, 30L))))
  }

  test("ArrayMinAgg skips null input arrays instead of poisoning the group") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.col
    val df = Seq((1, Option(Seq(5L, 1L, 9L))), (1, None),
                 (1, Option(Seq(3L, 7L, 2L))), (2, None))
      .toDF("id", "arr").repartition(3)
    val agg = GraftColumnBridge.column(
      graft.plans.ArrayMinAgg(GraftColumnBridge.expression(col("arr")), 3)
        .toAggregateExpression())
    val got = df.groupBy("id").agg(agg.as("sig")).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
    // group 1: null row ignored like built-in min; group 2: all-null input
    // keeps the initial MaxValue buffer (never null — dataType promises it)
    assert(got.toSeq == Seq(
      (1, Seq(3L, 1L, 2L)),
      (2, Seq(Long.MaxValue, Long.MaxValue, Long.MaxValue))))
  }

  test("WinnowSketch matches a reference computation and handles edges") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    def sketchOf(texts: String*): Seq[Seq[Long]] = {
      val c = GraftColumnBridge.column(
        graft.plans.WinnowSketch(GraftColumnBridge.expression(col("t")), 4, 3))
      texts.toDF("t").select(c.as("s")).collect().map(_.getSeq[Long](0)).toSeq
    }
    // reference computation in plain Scala
    def ref(t: String, k: Int = 4, w: Int = 3): Seq[Long] = {
      val cps = t.codePoints().toArray
      val nG = math.max(cps.length - k, 0) + 1
      val grams = (0 until nG).map { i =>
        cps.slice(i, math.min(i + k, cps.length))
          .foldLeft(0L)((acc, c) => (acc * 257 + c) % 2147483647L)
      }
      val nW = math.max(nG - w, 0) + 1
      (0 until nW).map(j => grams.slice(j, math.min(j + w, nG)).min).distinct
    }
    val texts = Seq("the quick brown fox", "ab", "", "aaaaaaaaaa")
    assert(sketchOf(texts: _*) == texts.map(ref(_)))
    // identical text → identical sketch (the dedup-join property)
    assert(ref("same text here") == ref("same text here"))
    // short text (< k) hashes its truncated prefix, not nothing
    assert(ref("ab").nonEmpty && ref("").== (Seq(0L)))
  }

  test("extensions class injects all registrations") {
    // a fresh session can't be built in the shared test JVM (getOrCreate
    // reuses the context and ignores spark.sql.extensions); the conf path
    // is exercised for real by the Verify/Bench session builders — here we
    // drive the injection hook directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    assert(GraftExtensions.registrations.map(_._1).toSet ==
      Set("normalize_numerics", "coerce_numeric", "coerce_datetime",
        "coerce_bool", "char_ngrams", "winnow_sketch", "shingles", "poly_hash"))
  }

  test("SQL-registered winnow_sketch/shingles/poly_hash evaluate") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT size(winnow_sketch('the quick brown fox', 4, 3)) AS nw, " +
      "size(shingles('a b c d', 2)) AS ns, poly_hash('abc') AS ph").head()
    assert(r.getInt(0) > 0)
    assert(r.getInt(1) == 3) // 'a b', 'b c', 'c d'
    // ((0*31+97)%p *31+98)%p *31+99 = 97*961 + 98*31 + 99
    assert(r.getLong(2) == 97L * 961 + 98 * 31 + 99)
  }
}
