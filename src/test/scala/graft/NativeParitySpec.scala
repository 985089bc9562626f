package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native codegen expressions must be BIT-IDENTICAL to the
  * declarative higher-order-function formulations they replaced — on
  * arbitrary strings (whitespace runs, unicode, empties), not just the
  * ASCII test corpus. Each check evaluates both formulations over the
  * whole generated sample in ONE job and diffs row-wise. */
class NativeParitySpec extends SparkSpec {
  import spark.implicits._

  private val wordChar = Gen.frequency(
    (8, Gen.alphaNumChar), (2, Gen.oneOf('ä', 'ß', 'é', '中', '.', ',')))
  private val word = Gen.choose(0, 8).flatMap(n => Gen.stringOfN(n, wordChar))
  private val sep = Gen.oneOf(" ", "  ", "\t", " \t ")
  private val textGen: Gen[String] = for {
    k <- Gen.choose(0, 12)
    ws <- Gen.listOfN(k, word)
    ss <- Gen.listOfN(math.max(k - 1, 0), sep)
    pad <- Gen.oneOf("", " ", "\t ")
  } yield pad + ws.zipAll(ss, "", "").map { case (w, s) => w + s }.mkString + pad

  private def sample(n: Int, seed: Long = 42L): Seq[String] =
    Gen.listOfN(n, textGen)(Gen.Parameters.default, org.scalacheck.rng.Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private def inspect(s: String): String =
    s.map(c => if (c < 127) c.toString else f"\\u${c.toInt}%04x").mkString("\"", "", "\"")

  private def assertParity(texts: Seq[String], native: Column,
                           declarative: Column, label: String): Unit = {
    val bad = texts.toDF("t")
      .select(col("t"), native.as("a"), declarative.as("b"))
      .collect().filter(r => r.get(1) != r.get(2))
    assert(bad.isEmpty, s"$label diverged on " +
      bad.take(3).map(r => inspect(r.getString(0))).mkString(", "))
  }

  test("ShingleArray ≡ declarative transform/slice/concat_ws formulation") {
    def declarativeShingles(text: Column, n: Int): Column = {
      val toks = split(TextOps.normalizeText(text), " ")
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
        s => length(s) > 0)
    }
    val texts = sample(120)
    for (n <- Seq(1, 2, 5))
      assertParity(texts, Dedup.shingles(col("t"), n),
        declarativeShingles(col("t"), n), s"shingles(n=$n)")
  }

  test("ShingleHashArray ≡ elementwise hash over ShingleArray (both flavors)") {
    // the fused shingle+hash must be BIT-identical to hashing the
    // materialized shingles: xxhash64 flavor byte-for-byte (XXH64 over
    // the same UTF-8 slice, seed 42), polyHash flavor code-point-exact —
    // including multi-byte tokens, whitespace runs, empties, and n >
    // token count (single clamped window)
    val texts = sample(150) ++ Seq("", " \t ", "one", "ä 中 é", "a b c d e f")
    for (n <- Seq(1, 2, 5, 8)) {
      assertParity(texts,
        Dedup.shingleHashArr(col("t"), n, poly = false),
        transform(Dedup.shingles(col("t"), n), s => xxhash64(s)),
        s"shingleHashArr(xx, n=$n)")
      assertParity(texts,
        Dedup.shingleHashArr(col("t"), n, poly = true),
        transform(Dedup.shingles(col("t"), n), s => Dedup.polyHash(s)),
        s"shingleHashArr(poly, n=$n)")
    }
  }

  test("PolyHash ≡ declarative char-fold formulation") {
    def declarativePolyHash(t: Column): Column =
      aggregate(transform(split(t, ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => pmod(acc * 31 + c, lit(2147483647L)))
    assertParity(sample(150), Dedup.polyHash(col("t")),
      declarativePolyHash(col("t")), "polyHash")
  }

  test("TokenMatchCount ≡ declarative filter/isin formulation") {
    val words = Seq("the", "a", "ab", "ä", "x1")
    def declarativeCount(text: Column): Column =
      size(filter(TextOps.tokens(text), t => t.isin(words.map(lit(_)): _*)))
    // seed guaranteed hits alongside the random sample
    val texts = sample(120) ++ Seq("the a the", "ä \t ab", "x1")
    assertParity(texts, TextOps.matchCount(col("t"), words),
      declarativeCount(col("t")), "matchCount")
  }

  test("WinnowSketch ≡ declarative gram/window formulation (non-empty text)") {
    def declarativeWinnow(k: Int, w: Int): Column = {
      val t = col("t")
      val chars = transform(sequence(lit(1), length(t)),
        j => ascii(t.substr(j, lit(1))).cast("long"))
      val grams = transform(sequence(lit(0), greatest(length(t) - k, lit(0))),
        i => aggregate(slice(chars, i + 1, lit(k)), lit(0L),
          (acc, c) => pmod(acc * 257L + c, lit(2147483647L))))
      val wins = transform(sequence(lit(0), greatest(size(grams) - w, lit(0))),
        j => array_min(slice(grams, j + 1, lit(w))))
      array_distinct(wins)
    }
    import org.apache.spark.sql.GraftColumnBridge
    def nativeWinnow(k: Int, w: Int): Column = GraftColumnBridge.column(
      graft.plans.WinnowSketch(GraftColumnBridge.expression(col("t")), k, w))
    // the declarative formulation mis-handles "" (descending sequence);
    // the native expression matches the SQL oracle there instead
    val texts = sample(80).filter(_.nonEmpty)
    for ((k, w) <- Seq((2, 1), (4, 3), (8, 4)))
      assertParity(texts, nativeWinnow(k, w), declarativeWinnow(k, w),
        s"winnow($k,$w)")
  }

  test("TokenNgrams ≡ declarative transform/sequence/slice formulation") {
    import org.apache.spark.sql.GraftColumnBridge
    def declarative(toks: Column, n: Int): Column =
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    def native(toks: Column, n: Int): Column = GraftColumnBridge.column(
      graft.plans.TokenNgrams(GraftColumnBridge.expression(toks), n))
    // arrays from the text generator's token shapes, plus the empty and
    // the shorter-than-n degenerate cases the oracle replays
    val arrays: Seq[Seq[String]] =
      sample(100).map(_.split("\\s+").toSeq.filter(_.nonEmpty)) ++
        Seq(Seq.empty, Seq("one"), Seq("a", "b"))
    val df = arrays.toDF("toks")
    for (n <- Seq(1, 2, 3)) {
      val bad = df.select(native(col("toks"), n).as("a"),
          declarative(col("toks"), n).as("b"))
        .collect().filter(r => r.get(0) != r.get(1))
      assert(bad.isEmpty, s"TokenNgrams(n=$n) diverged: ${bad.take(3).mkString(", ")}")
    }
  }

  test("VecFold ≡ declarative aggregate/zip_with folds (dot + squared L2)") {
    import org.apache.spark.sql.GraftColumnBridge
    def declDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    def declSq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v)
    def native(a: Column, b: Column, squared: Boolean): Column =
      GraftColumnBridge.column(graft.plans.VecFold(
        GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), squared))

    val rnd = new scala.util.Random(7)
    def vec(n: Int): Seq[Float] = Seq.fill(n)((rnd.nextGaussian() * 3).toFloat)
    // equal lengths, the empty vector, and a length mismatch (→ null via
    // zip_with's null padding) — accumulation order must match bitwise
    val rows = Seq.fill(60)((vec(16), vec(16))) ++
      Seq((vec(0), vec(0)), (vec(5), vec(3)), (vec(3), vec(5)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        native(col("a"), col("b"), squared = false).as("nd"),
        declDot(col("a"), col("b")).as("dd"),
        native(col("a"), col("b"), squared = true).as("ns"),
        declSq(col("a"), col("b")).as("ds"))
      .collect().filter(r => r.get(0) != r.get(1) || r.get(2) != r.get(3))
    assert(bad.isEmpty, s"VecFold diverged: ${bad.take(3).mkString(", ")}")

    // int-array side (the ±1 hyperplane literals) against float vectors
    val planes = Seq.fill(30)((vec(8), Seq.fill(8)(if (rnd.nextBoolean()) 1 else -1)))
    val badP = planes.toDF("v", "p").select(
        native(col("v"), col("p"), squared = false).as("nd"),
        declDot(col("v"), col("p")).as("dd"))
      .collect().filter(r => r.get(0) != r.get(1))
    assert(badP.isEmpty, s"VecFold(int planes) diverged: ${badP.take(3).mkString(", ")}")
  }
}
