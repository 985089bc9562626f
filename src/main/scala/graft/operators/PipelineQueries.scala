package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline query battery: text analysis, dedup family,
  * similarity search — each a `queries()` entry over the documents /
  * embeddings tables, every one carrying a DuckDB oracle. The
  * seeded-randomness operators are verified by recomputation: SimHash and
  * hyperplane-LSH oracles interpolate the seeded coefficients/planes into
  * generated SQL and redo the full computation; MinHash-LSH is gated
  * against the exact n-gram Jaccard pair set (recall-1 on this corpus,
  * precision-1 by its exact-verify stage).
  */
object PipelineQueries {

  private[operators] val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  /** documents ∪ a perturbed copy (first token dropped, id+100000) — the
    * corpus used by the dedup queries so near-duplicates actually exist. */
  private[operators] def dupCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
  }

  /** Per-document stats: token counts, char counts, BPE-ish token
    * estimate, punctuation count, stopword ratio. */
  def q17TextStats(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextOps.tokenCount(t).cast("long").as("n_tokens"),
      length(t).cast("long").as("n_chars_c"),
      TextOps.tokenEstimate(t).as("tok_est"),
      TextOps.punctCount(t).cast("long").as("n_punct"),
      TextOps.wordRatio(t, stopwords).as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Quality score + language ID (marker heuristic). */
  def q18TextQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val scores = TextOps.langScores(t).toMap
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextOps.qualityScore(t, stopwords).as("quality"),
      scores("en").cast("long").as("en_score"),
      scores("de").cast("long").as("de_score"),
      TextOps.langId(t).as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Exact dedup via text fingerprint over the duplicated corpus. */
  def q19DedupExact(spark: SparkSession, dir: String): DataFrame = {
    // only full duplicates collapse: corpus has each doc twice under
    // different ids only when the perturbation was a no-op (single-token
    // docs); otherwise n_copies=1 — the interesting signal is the group-by
    // itself, verified exactly.
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    Dedup.exact(corpus, "doc_id", "text")
      .orderBy(col("fp"))
  }

  /** N-gram Jaccard near-dup pairs (threshold 0.5) over the perturbed
    * corpus. */
  def q20DedupNgram(spark: SparkSession, dir: String): DataFrame = {
    Dedup.ngramJaccardPairs(dupCorpus(spark, dir), "doc_id", "text",
        n = 5, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash+LSH near-dup pairs — banded candidates + exact verification.
    * The exact-Jaccard verification step means precision is 1 by
    * construction; the oracle (q20's exact pair set) additionally asserts
    * 100% LSH recall on this corpus, verified to hold at sf0.001/sf0.01
    * (candidate recall only matters near the 0.5 threshold, and the
    * perturbed-copy pairs sit well above it). */
  def q21MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    Dedup.minhashLshPairs(dupCorpus(spark, dir), "doc_id", "text",
        n = 5, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs (Hamming ≤ 3 over the 60-bit portable
    * signature). The portable variant's polynomial + universal hashes are
    * re-expressible in SQL, so the oracle recomputes the signatures
    * bit-exactly; pigeonhole banding makes the emitted pair set EXACTLY
    * all pairs within the Hamming radius (no sampling slack to hide in). */
  def q22Simhash(spark: SparkSession, dir: String): DataFrame = {
    Dedup.simhashPairsPortable(dupCorpus(spark, dir), "doc_id", "text",
        maxDist = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Near-dup GROUP resolution: exact-Jaccard pairs → connected
    * components → canonical representative per group (the decision step
    * of a dedup pipeline). Oracle recomputes the transitive closure with
    * a recursive CTE. */
  def q50DupGroups(spark: SparkSession, dir: String): DataFrame = {
    val corpus = dupCorpus(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 5, threshold = 0.5)
    Dedup.dupGroups(corpus, "doc_id", pairs).orderBy(col("id"))
  }

  /** Deterministic corpus curation sample: balanced per-language quota
    * (20 docs/lang by key hash) + stable train/val/test split labels —
    * both decided by engine-portable universal hashes, fully recomputed
    * by the oracle. */
  def q51Sample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val quota = Sampling.stratifiedQuota(docs, "lang", "doc_id", k = 20, seed = 7L)
    Sampling.withSplit(quota, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 11L)
      .orderBy(col("lang"), col("sample_rank"))
  }

  /** Sliding-window chunking of the corpus (64-token windows, stride 48)
    * — context-window preparation; oracle recomputes windows from the
    * same arithmetic. */
  def q52Chunks(spark: SparkSession, dir: String): DataFrame = {
    TextOps.chunkTokens(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", chunkSize = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Train/test decontamination: split the (near-dup-seeded) corpus with
    * stable key hashes, then find test documents sharing ≥5 distinct
    * 8-gram shingles with any train document — the n-gram-overlap
    * contamination check run before an evaluation split ships. Shingle
    * equi-join (never all-pairs), reusing the dedup machinery. */
  def q53Decontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sampling.withSplit(dupCorpus(spark, dir), "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1), seed = 13L)
    // cache: both the train and the test branch filter this relation —
    // without it the explode+distinct shuffle runs twice. Shingles are
    // hashed to 64 bits BEFORE the distinct, so the exchange (and the
    // cache, and the contamination join) carry longs instead of 8-word
    // strings — the q20/q21 discipline (guide §2.3); n_common is a
    // distinct-hash count, equal to the string count unless two
    // different shingles collide in 2⁶⁴ (oracle-confirmed equal here)
    val sh = docs.select(col("doc_id"), col("split"),
        explode(Dedup.shingleHashArr(col("text"), 8, poly = false)).as("sh"))
      .distinct().cache()
    // materialize eagerly: the shingle relation is a standing index (in a
    // deployment it is built once and probed by every decontam run), and a
    // lazily-filled cache made the first post-build execution pay the
    // whole materialization — bimodal timings with no plan difference.
    // Count is cheap (metadata-only over the cached relation afterwards).
    sh.count()
    val train = sh.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("sh"))
    val test = sh.filter(col("split") === "test")
      .select(col("doc_id").as("test_id"), col("sh"))
    test.join(train, "sh")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 5)
      .orderBy(col("test_id"), col("train_id"))
  }

  /** PII scrubbing: deterministic synthetic PII (derived from doc_id, so
    * both engines construct identical text) is seeded into the corpus,
    * then counted and redacted — placeholder-stable so fingerprints/dedup
    * don't churn across reruns. */
  def q54PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val seeded = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .withColumn("text", concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" from 10.0."), pmod(col("doc_id"), lit(200)).cast("string"),
        lit("."), pmod(col("doc_id"), lit(250)).cast("string"),
        lit(" tel +43 660 "), (lit(100) + pmod(col("doc_id"), lit(900))).cast("string"),
        lit(" "), (lit(1000) + pmod(col("doc_id"), lit(9000))).cast("string"),
        lit(" iban DE"), lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
        lit("5001"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit("06641234"),
        lit(" card 4111-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit("-2222-"), lpad(pmod(col("doc_id"), lit(9999)).cast("string"), 4, "0")))
    val counts = TextOps.piiCounts(col("text")).toMap
    seeded.select(col("doc_id"),
        counts("email").as("n_email"), counts("ip").as("n_ip"),
        counts("phone").as("n_phone"), counts("iban").as("n_iban"),
        counts("card").as("n_card"),
        TextOps.redactPii(col("text")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition filters over the corpus: top-unigram /
    * top-bigram / duplicate-unigram fractions with an integer-decided
    * keep gate. */
  def q56Repetition(spark: SparkSession, dir: String): DataFrame = {
    TextOps.repetitionStats(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** End-to-end curation COMPOSITION gate: the declarative
    * [[graft.pipeline.CurationPipeline]] (quality rules → exact dedup →
    * chunking) over a dup-seeded corpus, with the oracle recomputing the
    * entire chain in SQL — certifying not just each operator but their
    * composition. */
  def q63Curation(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.CurationPipeline
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionByName(
      d.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    CurationPipeline.run(corpus, "doc_id", "text", Seq(
        CurationPipeline.QualityGate(stopwords, blocklist = Seq("slow")),
        CurationPipeline.ExactDedup,
        CurationPipeline.Chunk(size = 64, stride = 48)))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Cross-document line-level dedup gate ([[Dedup.lineDedup]]): a
    * synthesized multi-line corpus — a shared header in EVERY doc, a
    * cookie banner in every 3rd, a footer in every 5th, each doc's own
    * text plus unique intro/outro lines, and exact-dup seeds below the
    * threshold — where boilerplate lines must vanish from every document
    * and everything else survives in original order. */
  def q65LineDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val seeded = d.unionByName(
      d.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val corpus = seeded.select(col("doc_id"), concat_ws("\n",
        lit("=== shared header ==="),
        when(col("doc_id") % 3 === 0, lit("cookie banner accept"))
          .otherwise(concat(lit("intro "), col("doc_id").cast("string"))),
        col("text"),
        when(col("doc_id") % 5 === 0, lit("footer contact us"))
          .otherwise(concat(lit("outro "), col("doc_id").cast("string")))
      ).as("text"))
    Dedup.lineDedup(corpus, "doc_id", "text", minDocs = 5)
      .orderBy(col("doc_id"))
  }

  /** Bloom-filter decontamination gate ([[Bloom.decontaminate]]): the
    * q53 corpus/split, with the test split's 8-gram shingles folded into
    * a 2²⁰-bit / 3-hash Bloom bitmap and the train split probed against
    * it — per-document flagged-gram counts and the contamination verdict,
    * false positives included (the oracle replays the exact bit set, so
    * the filter's own semantics are value-checked, not approximated). */
  def q66BloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sampling.withSplit(dupCorpus(spark, dir), "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1), seed = 13L)
    Bloom.decontaminate(
        docs.filter(col("split") === "train"), "doc_id", "text",
        docs.filter(col("split") === "test"), "text",
        shingleN = 8, numBits = 1 << 20, numHashes = 3, minHits = 5,
        seed = 29L)
      .orderBy(col("doc_id"))
  }

  /** BM25-shaped retrieval gate ([[Retrieval.bm25TopK]]): query docs are
    * the first 8 documents, each contributing its 4 lexicographically
    * first distinct tokens as query terms; top-10 per query by the
    * rational-idf score, ties broken on doc_id. The oracle mirrors the
    * score's expression tree parenthesis-for-parenthesis (pure IEEE
    * `+ * /`, no ln) and the order-canonicalized term-score fold. */
  def q67Bm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("term"))
    val qterms = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        explode(TextOps.tokens(col("text"))).as("term"))
      .distinct()
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 4).drop("r")
    Retrieval.bm25TopK(docs, "doc_id", "text", qterms, "query_id", "term",
        k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Character-trigram language ID over the corpus: per-language profile
    * scores + the winning language (first-listed wins ties, 0 everywhere
    * → "und") — the n-gram flavor of q18's marker-word langID. The
    * oracle interpolates the deterministic trigram profiles. */
  def q64LangNgram(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val scores = TextOps.langMarkers.map { case (lang, words) =>
      lang -> TextOps.langScoreNgram(t, TextOps.trigramProfile(words))
    }
    val pred = scores.foldLeft((lit("und"), lit(0L))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
    Tables.documents(spark, dir).select(
        (col("doc_id") +: scores.map { case (l, s) => s.as(s"${l}_tri") }) :+
          pred.as("lang_pred"): _*)
      .orderBy(col("doc_id"))
  }

  /** Winnowing sketch of every document: (doc_id, fingerprint) pairs from
    * 8-gram rolling hashes winnowed by windows of 4 — the oracle replays
    * the identical char/gram/window arithmetic in DuckDB. */
  def q60Winnow(spark: SparkSession, dir: String): DataFrame = {
    TextOps.winnow(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8, w = 4)
      .orderBy(col("doc_id"), col("fp"))
  }

  /** C4-style rule gate: per-document rule verdicts + keep conjunction. */
  def q57QualityGate(spark: SparkSession, dir: String): DataFrame = {
    TextOps.qualityGate(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", stopwords, blocklist = Seq("slow"))
      .orderBy(col("doc_id"))
  }

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  def q23SimTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style probe: top-3 within the query's own label cluster, for
    * vec_id < 20. */
  def q24SimIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", "label", k = 3)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Random-hyperplane LSH top-k. The seeded ±1 planes are generated
    * Scala-side and embedded as literals into the oracle SQL, which
    * replicates the sign-projection bucketing and the exact left-fold
    * cosine — a full independent recomputation, not a rows-only check. */
  def q25SimLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", dim = 64, numBits = 8, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-dup pairs over the embeddings table seeded with
    * exact-direction twins (vectors scaled by 2 — a power of two, so every
    * float/double operation on them is exact in BOTH engines and the
    * sign-projection buckets are identical to the original's). Banded
    * hyperplane LSH candidates + exact cosine ≥ 0.9 verify; the oracle
    * interpolates the seeded planes and redoes the whole computation. */
  def q55EmbedDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val twins = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), v => v * lit(2.0f)).as("embedding"))
    Similarity.embedNearDupPairs(emb.unionByName(twins), "vec_id", "embedding",
        dim = 64, bands = 4, bitsPerBand = 8, minCos = 0.9)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Multimodal plumbing: documents as opaque binary payloads → batched
    * (stubbed) decode → feature extraction → frame sampling, aggregated
    * back per document. The stub arithmetic is re-expressed in the oracle,
    * certifying the schema/batching/partition plumbing end-to-end. */
  def q30Multimodal(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val withPayload = Multimodal.withPayload(
      docs.withColumn("content", encode(col("text"), "UTF-8")), "content")
      .drop("content", "text")
    val decoded = Multimodal.decodeBatched(withPayload, "payload")
    val featured = Multimodal.extractFeatures(decoded, "payload", dim = 8)
    val sampled = Multimodal.sampleFrames(decoded, stride = 7)
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("n_sampled"))
    featured
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("n_frames"),
        element_at(col("features"), 1).cast("double").as("f0"),
        element_at(col("features"), 8).cast("double").as("f7"))
      .join(sampled, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** REAL image decode gate: deterministic 24-bit BMPs (pixel channels
    * are closed-form functions of (doc_id, x, y) —
    * [[Multimodal.syntheticBmp]]) are decoded by the JDK's ImageIO and
    * featurized ([[Multimodal.imageFeatures]]: mean luminance +
    * 8-bin intensity histogram). BMP is uncompressed, so the oracle
    * recomputes every feature from the pixel formula alone — the decode
    * step itself is value-checked, not just the plumbing (the q30
    * contrast: there the payloads are text and the STUB arithmetic is
    * what the oracle replays). */
  def q113ImageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") < 200)
    val imgs = ids.as[Long].mapPartitions { it =>
      it.map { d =>
        (d, Multimodal.syntheticBmp(d, (4 + d % 5).toInt, (3 + d % 4).toInt))
      }
    }.toDF("doc_id", "payload")
    val decoded = Multimodal.decodeBatched(imgs, "payload")
    val feats = Multimodal.extractFeatures(decoded, "payload", dim = 9)
    feats.select(col("doc_id"), col("width"), col("height"), col("mime"),
        col("n_bytes"),
        element_at(col("features"), 1).cast("double").as("mean_lum"),
        element_at(col("features"), 2).cast("double").as("hist0"),
        element_at(col("features"), 9).cast("double").as("hist7"))
      .orderBy(col("doc_id"))
  }

  /** Video-container metadata gate: deterministic MP4 (ISO BMFF box tree)
    * and AVI (RIFF) containers synthesized closed-form from doc_id
    * ([[Multimodal.syntheticMp4]]/[[Multimodal.syntheticAvi]]) run through
    * the batched decode — [[Multimodal.mp4Meta]]/[[Multimodal.aviMeta]]
    * walk the real box/chunk structure, so the oracle replays every value
    * from the synthesis parameters alone (the decode is value-checked,
    * like q113 for images; only frame PIXEL decode remains stubbed). */
  def q118VideoMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"))
      .filter(col("doc_id") < 200)
    val vids = ids.as[Long].mapPartitions { it =>
      it.map { d =>
        val w = (100 + d % 50).toInt
        val h = (60 + d % 40).toInt
        val f = (1 + d % 25).toInt
        (d, if (d % 2 == 0) Multimodal.syntheticMp4(w, h, f)
            else Multimodal.syntheticAvi(w, h, f))
      }
    }.toDF("doc_id", "payload")
    Multimodal.decodeBatched(vids, "payload")
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Encoding-health gate ([[TextOps.encodingStats]]): replacement chars,
    * stray C0 controls, cp1252-mojibake artifact sequences, and the
    * printable-ASCII ppm. The corpus is deterministically contaminated
    * from doc_id (every 3rd doc gets mojibake, every 5th a U+FFFD, every
    * 7th a control char) so the counters are exercised; contamination
    * strings and the artifact alternation are INTERPOLATED into the
    * oracle from the same Scala constants — one source of truth, no
    * hand-retyped mojibake. */
  def q120EncodingQuality(spark: SparkSession, dir: String): DataFrame = {
    val moji = TextOps.MojibakeArtifacts
    val contaminated = concat(coalesce(col("text"), lit("")),
      when(col("doc_id") % 3 === 0, lit(" " + moji.head + moji(8))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit(" �")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(" x")).otherwise(lit("")))
    val stats = TextOps.encodingStats(contaminated)
    Tables.documents(spark, dir)
      .select(col("doc_id") +:
        (stats.map { case (n, c) => c.as(n) } :+
          length(contaminated).as("n_chars_c")): _*)
      .withColumn("ascii_ppm",
        expr("1000000 * n_ascii div greatest(n_chars_c, 1)"))
      .drop("n_chars_c")
      .orderBy(col("doc_id"))
  }

  /** Script-mix gate ([[TextOps.scriptCounts]]): documents are
    * deterministically spiked with non-Latin snippets (built from code
    * points — no literal non-ASCII in source) and every per-script count
    * is value-checked; snippets interpolate into the oracle from the same
    * constants. */
  def q121ScriptMix(spark: SparkSession, dir: String): DataFrame = {
    val contaminated = concat(coalesce(col("text"), lit("")),
      when(col("doc_id") % 4 === 0, lit(" " + Snippets.cyrillic)).otherwise(lit("")),
      when(col("doc_id") % 4 === 1, lit(" " + Snippets.cjk)).otherwise(lit("")),
      when(col("doc_id") % 4 === 2, lit(" " + Snippets.arabic)).otherwise(lit("")))
    val stats = TextOps.scriptCounts(contaminated)
    Tables.documents(spark, dir)
      .select(col("doc_id") +: stats.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  /** Deterministic non-Latin snippets for q121, constructed from code
    * points so the source file stays ASCII-safe. */
  private[operators] object Snippets {
    private def fromCps(cps: Range): String =
      cps.map(cp => new String(Character.toChars(cp))).mkString
    val cyrillic: String = fromCps(0x0410 to 0x0419) // А..Й
    val cjk: String = fromCps(0x4E00 to 0x4E07)      // 一..万
    val arabic: String = fromCps(0x0627 to 0x062E)   // ا..خ
  }

  /** Corpus vocabulary: top-5 tokens per language by frequency (the
    * explode-heavy shape of vocabulary building at scale: one shuffle on
    * (lang, token) with partial counts, then a per-lang top-k window). */
  def q41Vocab(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("token"))
    toks.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy(col("lang"), col("rank"))
  }

  /** Document frequency / inverse-ratio per token (TF-IDF's corpus pass);
    * ratio instead of ln() so the result is libm-independent. */
  def q42DocFreq(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("idf_ratio", lit(n.toDouble) / col("df").cast("double"))
      .orderBy(col("df").desc, col("token"))
      .limit(20)
  }

  /** Per-label embedding centroids: element-wise means with an
    * order-canonicalized double fold (sort each group's values, fold
    * left) so the result is bit-exact regardless of partitioning — the
    * corpus side of IVF/cluster training. (Engines round float→decimal
    * differently, so a decimal-sum mean is NOT cross-engine exact.)
    *
    * Scale note: the sorted fold buffers one group's values
    * (collect_list) — that is the price of CROSS-ENGINE bit-exactness and
    * belongs to the verification gate only. The production centroid path
    * ([[Similarity.trainCentroids]]) instead sums fixed-point longs —
    * partial-aggregated, no per-group buffer — which is both
    * partitioning-independent and cross-engine replayable. */
  def q43Centroids(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sort_array(collect_list(col("v").cast("double"))).as("vs"))
      .select(col("label"), col("pos").cast("long").as("pos"),
        (aggregate(col("vs"), lit(0.0), (acc, x) => acc + x) / size(col("vs")))
          .as("centroid"))
      .orderBy(col("label"), col("pos"))
  }

  /** Sessionization: 30-minute-gap sessions per user (lag + cumulative
    * flag sum — one shuffle on user_id). */
  def q44Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_vocab"        -> q41Vocab _,
    "q42_doc_freq"     -> q42DocFreq _,
    "q43_centroids"    -> q43Centroids _,
    "q44_sessionize"   -> q44Sessionize _,
    "q30_multimodal"   -> q30Multimodal _,
    "q17_text_stats"   -> q17TextStats _,
    "q18_text_quality" -> q18TextQuality _,
    "q19_dedup_exact"  -> q19DedupExact _,
    "q20_dedup_ngram"  -> q20DedupNgram _,
    "q21_minhash_lsh"  -> q21MinhashLsh _,
    "q22_simhash"      -> q22Simhash _,
    "q23_sim_topk"     -> q23SimTopK _,
    "q24_sim_ivf"      -> q24SimIvf _,
    "q25_sim_lsh"      -> q25SimLsh _,
    "q50_dup_groups"   -> q50DupGroups _,
    "q51_sample"       -> q51Sample _,
    "q52_chunks"       -> q52Chunks _,
    "q53_decontam"     -> q53Decontam _,
    "q54_pii_redact"   -> q54PiiRedact _,
    "q55_embed_dup"    -> q55EmbedDup _,
    "q56_repetition"   -> q56Repetition _,
    "q57_quality_gate" -> q57QualityGate _,
    "q60_winnow"       -> q60Winnow _,
    "q63_curation"     -> q63Curation _,
    "q64_lang_ngram"   -> q64LangNgram _,
    "q65_line_dedup"   -> q65LineDedup _,
    "q66_bloom_decontam" -> q66BloomDecontam _,
    "q67_bm25_topk"    -> q67Bm25 _,
    "q113_image_features" -> q113ImageFeatures _,
    "q118_video_meta"  -> q118VideoMeta _,
    "q120_encoding_quality" -> q120EncodingQuality _,
    "q121_script_mix"  -> q121ScriptMix _,
  )

  private[operators] val stopList = stopwords.map(s => s"'$s'").mkString(", ")
  private[operators] val cosineSql =
    """list_reduce(list_prepend(0.0, list_transform(list_zip(qv, cv),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, x) -> acc + x)
      |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(qv,
      |         v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (acc, x) -> acc + x))
      |     * sqrt(list_reduce(list_prepend(0.0, list_transform(cv,
      |         v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (acc, x) -> acc + x)))""".stripMargin

  private val ngramPairsSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\S+\s+', '') FROM documents),
      |norm AS (
      |  SELECT doc_id AS id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM corpus),
      |sh AS (
      |  SELECT DISTINCT id, sh FROM (
      |    SELECT id, unnest(list_transform(
      |      generate_series(0, greatest(len(toks) - 5, 0)),
      |      i -> array_to_string(toks[i+1:i+5], ' '))) AS sh
      |    FROM norm) t WHERE length(sh) > 0),
      |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      |  GROUP BY a.id, b.id)
      |SELECT id_a, id_b,
      |  CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.id = id_a
      |JOIN sizes sb ON sb.id = id_b
      |WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Full recomputation of [[Dedup.simhashPairsPortable]] in DuckDB: the
    * same polynomial char hash, the same (a_i, b_i) universal hashes
    * (interpolated from [[Dedup.simhashCoefs]]), the same 60-bit signature
    * assembly — then an all-pairs Hamming filter, which equals the banded
    * result because pigeonhole banding has exact recall for maxDist ≤ 3. */
  private val simhashSql: String = {
    val coefRows = Dedup.simhashCoefs(60, 42L).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\\S+\\s+', '') FROM documents),
      |toks AS (
      |  SELECT doc_id AS id,
      |    unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
      |  FROM corpus),
      |hashed AS (
      |  SELECT id, list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(t)),
      |                     i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 2147483647) AS h
      |  FROM toks),
      |bits AS (
      |  SELECT id, bit,
      |    CASE WHEN (h * a + b) % 2147483647 < 1073741823 THEN 1 ELSE -1 END AS contrib
      |  FROM hashed, (VALUES $coefRows) AS coef(bit, a, b)),
      |sums AS (SELECT id, bit, sum(contrib) AS s FROM bits GROUP BY id, bit),
      |sig AS (
      |  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
      |                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      |  FROM sums GROUP BY id)
      |SELECT a.id AS id_a, b.id AS id_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sig a JOIN sig b ON a.id < b.id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** Full recomputation of [[Similarity.lshTopK]] in DuckDB: the seeded ±1
    * planes (interpolated from [[Similarity.hyperplanes]]) drive the same
    * sign-projection bucketing, then exact left-fold cosine + top-k within
    * buckets. */
  private val lshSql: String = {
    val planes = Similarity.hyperplanes(dim = 64, numBits = 8, seed = 42L)
    val projCols = planes.zipWithIndex.map { case (plane, i) =>
      val lits = plane.map(v => s"$v.0").mkString(", ")
      s"""list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, [$lits]),
         |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, x) -> acc + x) AS p$i""".stripMargin
    }.mkString(",\n    ")
    val bucketExpr = planes.indices
      .map(i => s"(CASE WHEN p$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH proj AS (
      |  SELECT vec_id, embedding,
      |    $projCols
      |  FROM embeddings),
      |b AS (
      |  SELECT vec_id, embedding, $bucketExpr AS bucket FROM proj),
      |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
      |scored AS (
      |  SELECT query_id, neighbor_id, qv, cv, $cosineSql AS cos
      |  FROM c JOIN q USING (bucket)
      |  WHERE neighbor_id <> query_id)
      |SELECT query_id, neighbor_id, cos, rank FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
      |         AS BIGINT) AS rank
      |  FROM scored) t
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for [[q64LangNgram]]: trigram profiles interpolated as
    * literals; the fold's first-match-of-max tie rule expressed as a
    * CASE chain. */
  private val langNgramSql: String = {
    val scoreExprs = TextOps.langMarkers.map { case (lang, words) =>
      val lits = TextOps.trigramProfile(words)
        .map(t => s"'${t.replace("'", "''")}'").mkString(", ")
      s"CAST(len(list_filter([$lits], t -> contains(lower(text), t))) AS BIGINT) AS ${lang}_tri"
    }.mkString(",\n  ")
    s"""WITH s AS (
      |  SELECT doc_id,
      |  $scoreExprs
      |  FROM documents)
      |SELECT doc_id, en_tri, de_tri, fr_tri, es_tri,
      |  CASE WHEN greatest(en_tri, de_tri, fr_tri, es_tri) = 0 THEN 'und'
      |       WHEN en_tri = greatest(en_tri, de_tri, fr_tri, es_tri) THEN 'en'
      |       WHEN de_tri = greatest(en_tri, de_tri, fr_tri, es_tri) THEN 'de'
      |       WHEN fr_tri = greatest(en_tri, de_tri, fr_tri, es_tri) THEN 'fr'
      |       ELSE 'es' END AS lang_pred
      |FROM s
      |ORDER BY doc_id""".stripMargin
  }

  /** Full DuckDB recomputation of [[q55EmbedDup]]: seeded twins, the 32
    * plane projections (4 bands × 8 bits, planes interpolated as literals),
    * per-band bucket join, pair dedup, exact left-fold cosine. */
  private val embedDupSql: String = {
    val bands = 4
    val bits = 8
    val planes = Similarity.hyperplanes(dim = 64, numBits = bands * bits, seed = 42L)
    val projCols = planes.zipWithIndex.map { case (plane, i) =>
      val lits = plane.map(v => s"$v.0").mkString(", ")
      s"""list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, [$lits]),
         |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (acc, x) -> acc + x) AS p$i""".stripMargin
    }.mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val bucket = (0 until bits)
        .map(bi => s"(CASE WHEN p${b * bits + bi} > 0 THEN ${1L << bi} ELSE 0 END)")
        .mkString(" + ")
      s"SELECT vec_id, embedding, $b AS band, $bucket AS bucket FROM proj"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(embedding, v -> CAST(v * 2 AS REAL))
      |  FROM embeddings WHERE vec_id % 5 = 0),
      |proj AS (
      |  SELECT vec_id, embedding,
      |    $projCols
      |  FROM corpus),
      |banded AS (
      |  $bandSelects),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
      |    a.embedding AS qv, b.embedding AS cv
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |scored AS (
      |  SELECT id_a, id_b, $cosineSql AS cos FROM cand)
      |SELECT id_a, id_b, cos FROM scored
      |WHERE cos >= 0.9
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** Transitive closure of the q20 pair graph via recursive CTE: min
    * reachable id per node = the group label [[Dedup.dupGroups]] computes
    * by distributed label propagation. CTE prefix shared with the q131
    * canonical-pick oracle ([[SelectionQueries]]). */
  private[operators] val dupGroupsCtes =
    """WITH RECURSIVE corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\S+\s+', '') FROM documents),
      |norm AS (
      |  SELECT doc_id AS id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM corpus),
      |sh AS (
      |  SELECT DISTINCT id, sh FROM (
      |    SELECT id, unnest(list_transform(
      |      generate_series(0, greatest(len(toks) - 5, 0)),
      |      i -> array_to_string(toks[i+1:i+5], ' '))) AS sh
      |    FROM norm) t WHERE length(sh) > 0),
      |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
      |cand AS (
      |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      |  GROUP BY a.id, b.id),
      |pairs AS (
      |  SELECT id_a, id_b FROM cand
      |  JOIN sizes sa ON sa.id = id_a
      |  JOIN sizes sb ON sb.id = id_b
      |  WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5),
      |edges AS (
      |  SELECT CAST(id_a AS BIGINT) AS a, CAST(id_b AS BIGINT) AS b FROM pairs
      |  UNION ALL
      |  SELECT CAST(id_b AS BIGINT), CAST(id_a AS BIGINT) FROM pairs),
      |reach AS (
      |  SELECT CAST(doc_id AS BIGINT) AS id, CAST(doc_id AS BIGINT) AS r FROM corpus
      |  UNION
      |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
      |grp AS (SELECT id, min(r) AS group_id FROM reach GROUP BY id)""".stripMargin

  private val dupGroupsSql =
    s"""$dupGroupsCtes
      |SELECT id, group_id,
      |  CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
      |  id = group_id AS is_canonical
      |FROM grp
      |ORDER BY id""".stripMargin

  /** Recomputes q51's universal hashes / quota ranks / split thresholds
    * from the same seeded coefficients ([[Sampling.coef]]). */
  private val sampleSql: String = {
    val p = Sampling.P
    val (a1, b1) = Sampling.coef(7L)
    val (a2, b2) = Sampling.coef(11L)
    val th = Sampling.splitThresholds(
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    s"""WITH h AS (
      |  SELECT doc_id, lang,
      |    ((doc_id % $p) * $a1 + $b1) % $p AS h1,
      |    ((doc_id % $p) * $a2 + $b2) % $p AS h2
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h1, doc_id) AS BIGINT) AS sample_rank,
      |    h2
      |  FROM h)
      |SELECT doc_id, lang, sample_rank,
      |  CASE WHEN h2 < ${th(0)._2} THEN 'train'
      |       WHEN h2 < ${th(1)._2} THEN 'val'
      |       ELSE 'test' END AS split
      |FROM ranked WHERE sample_rank <= 20
      |ORDER BY lang, sample_rank""".stripMargin
  }

  /** Recomputes q53: the same split hash (seed 13) and 8-gram shingle
    * equi-join in DuckDB. */
  private val decontamSql: String = {
    val p = Sampling.P
    val (a, b) = Sampling.coef(13L)
    val trainUpper = Sampling.splitThresholds(
      Seq("train" -> 0.9, "test" -> 0.1)).head._2
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\\S+\\s+', '') FROM documents),
      |split AS (
      |  SELECT doc_id, text,
      |    CASE WHEN ((doc_id % $p) * $a + $b) % $p < $trainUpper
      |         THEN 'train' ELSE 'test' END AS split
      |  FROM corpus),
      |norm AS (
      |  SELECT doc_id, split,
      |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      |  FROM split),
      |sh AS (
      |  SELECT DISTINCT doc_id, split, sh FROM (
      |    SELECT doc_id, split, unnest(list_transform(
      |      generate_series(0, greatest(len(toks) - 8, 0)),
      |      i -> array_to_string(toks[i+1:i+8], ' '))) AS sh
      |    FROM norm) t WHERE length(sh) > 0)
      |SELECT te.doc_id AS test_id, tr.doc_id AS train_id,
      |  count(*) AS n_common
      |FROM sh te JOIN sh tr ON te.sh = tr.sh
      |WHERE te.split = 'test' AND tr.split = 'train'
      |GROUP BY te.doc_id, tr.doc_id
      |HAVING count(*) >= 5
      |ORDER BY test_id, train_id""".stripMargin
  }

  /** Recomputes q66's Bloom filter EXACTLY: the same seeded double-hash
    * bit positions over the portable polynomial gram hash, with the bit
    * set expressed as a distinct-position set (pos bit set ⟺ pos emitted
    * by some benchmark gram) — so membership verdicts, false positives
    * included, are value-checked rather than approximated. */
  private val bloomDecontamSql: String = {
    val p = Sampling.P
    val (sa, sb) = Sampling.coef(13L)
    val trainUpper = Sampling.splitThresholds(
      Seq("train" -> 0.9, "test" -> 0.1)).head._2
    val numBits = 1 << 20
    val posExprs = (0 until 3).map { i =>
      val (a, b) = Sampling.coef(29L + i)
      s"((h * $a + $b) % $p) % $numBits AS p$i"
    }.mkString(",\n      |    ")
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, regexp_replace(text, '^\\S+\\s+', '') FROM documents),
      |split AS (
      |  SELECT doc_id, text,
      |    CASE WHEN ((doc_id % $p) * $sa + $sb) % $p < $trainUpper
      |         THEN 'train' ELSE 'test' END AS split
      |  FROM corpus),
      |norm AS (
      |  SELECT doc_id, split,
      |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      |  FROM split),
      |sh AS (
      |  SELECT DISTINCT doc_id, split, sh FROM (
      |    SELECT doc_id, split, unnest(list_transform(
      |      generate_series(0, greatest(len(toks) - 8, 0)),
      |      i -> array_to_string(toks[i+1:i+8], ' '))) AS sh
      |    FROM norm) t WHERE length(sh) > 0),
      |hashed AS (
      |  SELECT doc_id, split,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, length(sh)),
      |                     i -> CAST(ascii(substr(sh, i, 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 31 + c) % 2147483647) AS h
      |  FROM sh),
      |pos AS (
      |  SELECT doc_id, split,
      |    $posExprs
      |  FROM hashed),
      |bset AS (
      |  SELECT DISTINCT pb FROM (
      |    SELECT unnest([p0, p1, p2]) AS pb FROM pos WHERE split = 'test') t),
      |hits AS (
      |  SELECT doc_id,
      |    (p0 IN (SELECT pb FROM bset) AND p1 IN (SELECT pb FROM bset)
      |     AND p2 IN (SELECT pb FROM bset)) AS hit
      |  FROM pos WHERE split = 'train')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) >= 5 AS contaminated
      |FROM hits GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  /** Recomputes q67's rational-idf BM25 with the identical IEEE
    * expression tree (constants interpolated from the Scala doubles so
    * both engines parse the same bit patterns) and the identical
    * sorted-fold term-score sum. */
  private val bm25Sql: String = {
    val k1 = 1.2
    val b = 0.75
    val c1 = k1 + 1.0
    val c2 = 1.0 - b
    s"""WITH docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      |tf AS (
      |  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS t FROM docs) u GROUP BY doc_id, t),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |stats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM dl),
      |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |qt AS (
      |  SELECT query_id, term FROM (
      |    SELECT query_id, term,
      |      row_number() OVER (PARTITION BY query_id ORDER BY term) AS r
      |    FROM (SELECT DISTINCT doc_id AS query_id, unnest(toks) AS term
      |          FROM docs WHERE doc_id < 8) t1) t2
      |  WHERE r <= 4),
      |m AS (
      |  SELECT q.query_id, f.doc_id, f.tf, d.df, l.dl, s.n_docs, s.avgdl
      |  FROM qt q
      |  JOIN tf f ON f.term = q.term
      |  JOIN dfr d ON d.term = q.term
      |  JOIN dl l ON l.doc_id = f.doc_id, stats s),
      |sc AS (
      |  SELECT query_id, doc_id,
      |    ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |    * ((CAST(tf AS DOUBLE) * $c1)
      |       / (CAST(tf AS DOUBLE) + $k1 * ($c2 + $b * (CAST(dl AS DOUBLE) / avgdl)))) AS s
      |  FROM m),
      |agg AS (
      |  SELECT query_id, doc_id,
      |    list_reduce(list_prepend(0.0, list_sort(list(s))), (acc, x) -> acc + x) AS score,
      |    CAST(count(*) AS BIGINT) AS n_terms
      |  FROM sc GROUP BY query_id, doc_id)
      |SELECT query_id, doc_id, score, n_terms, rank FROM (
      |  SELECT query_id, doc_id, score, n_terms,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)
      |         AS BIGINT) AS rank
      |  FROM agg) t
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin
  }

  /** Recomputes q54 with the same regexes (RE2-compatible subset) and the
    * same doc_id-derived synthetic PII. */
  private val piiSql: String = {
    val e = TextOps.EmailRe
    val ip = TextOps.Ipv4Re
    val ph = TextOps.PhoneRe
    val ib = TextOps.IbanRe
    val cc = TextOps.CardRe
    s"""WITH seeded AS (
      |  SELECT doc_id,
      |    concat(text, ' contact user', doc_id, '@example.com',
      |           ' from 10.0.', doc_id % 200, '.', doc_id % 250,
      |           ' tel +43 660 ', 100 + doc_id % 900, ' ', 1000 + doc_id % 9000,
      |           ' iban DE', lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'),
      |           '5001', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), '06641234',
      |           ' card 4111-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
      |           '-2222-', lpad(CAST(doc_id % 9999 AS VARCHAR), 4, '0')) AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phone,
      |  CAST(len(regexp_extract_all(text, '$ib')) AS BIGINT) AS n_iban,
      |  CAST(len(regexp_extract_all(text, '$cc')) AS BIGINT) AS n_card,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |    '$e', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'), '$ph', '<PHONE>', 'g'),
      |    '$ib', '<IBAN>', 'g'), '$cc', '<CARD>', 'g') AS redacted
      |FROM seeded
      |ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q50_dup_groups" -> dupGroupsSql,
    "q51_sample"     -> sampleSql,
    "q53_decontam"   -> decontamSql,
    "q66_bloom_decontam" -> bloomDecontamSql,
    "q67_bm25_topk"  -> bm25Sql,
    "q54_pii_redact" -> piiSql,
    "q52_chunks" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |st AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    unnest(list_filter(list_transform(
        |      generate_series(0, len(toks) // 48), i -> i * 48),
        |      s -> s < len(toks))) AS s
        |  FROM base)
        |SELECT doc_id,
        |  CAST(s // 48 AS BIGINT) AS chunk_id,
        |  CAST(least(n - s, 64) AS BIGINT) AS chunk_tokens,
        |  array_to_string(toks[s+1:s+64], ' ') AS chunk_text
        |FROM st
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q41_vocab" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |counts AS (SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token)
        |SELECT lang, token, n, rank FROM (
        |  SELECT lang, token, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS BIGINT) AS rank
        |  FROM counts) t
        |WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    "q42_doc_freq" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |dfreq AS (SELECT token, count(*) AS df FROM toks GROUP BY token),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM documents)
        |SELECT token, df, n.total / CAST(df AS DOUBLE) AS idf_ratio
        |FROM dfreq, n
        |ORDER BY df DESC, token
        |LIMIT 20""".stripMargin,
    "q43_centroids" ->
      """SELECT label, CAST(x[2] AS BIGINT) AS pos,
        |  list_reduce(list_prepend(0.0, list_sort(list(CAST(x[1] AS DOUBLE)))),
        |              (acc, v) -> acc + v) / count(*) AS centroid
        |FROM (
        |  SELECT label,
        |    unnest(list_zip(embedding, generate_series(0, len(embedding) - 1))) AS x
        |  FROM embeddings) t
        |GROUP BY label, CAST(x[2] AS BIGINT)
        |ORDER BY label, pos""".stripMargin,
    "q44_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q30_multimodal" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
        |SELECT doc_id,
        |  CAST(nb AS BIGINT) AS n_bytes,
        |  CAST(nb % 640 + 1 AS INT) AS width,
        |  CAST(nb % 480 + 1 AS INT) AS height,
        |  CAST(nb % 30 + 1 AS INT) AS n_frames,
        |  CAST(CAST((nb * 7) % 1000 AS REAL) / CAST(1000 AS REAL) AS DOUBLE) AS f0,
        |  CAST(CAST((nb * 14) % 1000 AS REAL) / CAST(1000 AS REAL) AS DOUBLE) AS f7,
        |  CAST((nb % 30) // 7 + 1 AS BIGINT) AS n_sampled
        |FROM b
        |ORDER BY doc_id""".stripMargin,
    "q113_image_features" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id < 200),
        |px AS (
        |  SELECT d.doc_id, d.w, d.h,
        |    ((d.doc_id*31 + x.x*7 + y.y*13) % 256)
        |    + ((d.doc_id*17 + x.x*3 + y.y*5) % 256)
        |    + ((d.doc_id*23 + x.x*11 + y.y*2) % 256) AS s
        |  FROM d
        |  JOIN (SELECT unnest(range(0, 8)) AS x) x ON x.x < d.w
        |  JOIN (SELECT unnest(range(0, 6)) AS y) y ON y.y < d.h),
        |a AS (
        |  SELECT doc_id, w, h, count(*) AS n, sum(s) AS sums,
        |    sum(CASE WHEN s*8 // 766 = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN s*8 // 766 = 7 THEN 1 ELSE 0 END) AS c7
        |  FROM px GROUP BY doc_id, w, h)
        |SELECT doc_id,
        |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  'image/bmp' AS mime,
        |  CAST(54 + h * ((3*w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
        |  CAST(CAST(CAST(sums AS DOUBLE) / (765.0 * n) AS FLOAT) AS DOUBLE) AS mean_lum,
        |  CAST(CAST(CAST(c0 AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS hist0,
        |  CAST(CAST(CAST(c7 AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS hist7
        |FROM a
        |ORDER BY doc_id""".stripMargin,
    "q118_video_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'video/mp4'
        |       ELSE 'video/x-msvideo' END AS mime,
        |  CAST(100 + doc_id % 50 AS INTEGER) AS width,
        |  CAST(60 + doc_id % 40 AS INTEGER) AS height,
        |  CAST(1 + doc_id % 25 AS INTEGER) AS n_frames
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,
    "q120_encoding_quality" -> {
      // contamination strings and the artifact alternation interpolate
      // from the SAME Scala constants the Spark query uses
      val moji = TextOps.MojibakeArtifacts
      val contam3 = " " + moji.head + moji(8)
      val mojiAlt = moji.mkString("|")
      s"""WITH c AS (
        |  SELECT doc_id,
        |    coalesce(text, '')
        |      || CASE WHEN doc_id % 3 = 0 THEN '$contam3' ELSE '' END
        |      || CASE WHEN doc_id % 5 = 0 THEN ' �' ELSE '' END
        |      || CASE WHEN doc_id % 7 = 0 THEN ' x' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_split_to_array(t, '�')) - 1 AS BIGINT) AS n_repl,
        |  CAST(len(regexp_split_to_array(t,
        |    '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) - 1 AS BIGINT) AS n_ctrl,
        |  CAST(len(regexp_split_to_array(t, '$mojiAlt')) - 1 AS BIGINT) AS n_moji,
        |  CAST(length(t) - length(regexp_replace(t, '[\\x20-\\x7E]', '', 'g'))
        |    AS BIGINT) AS n_ascii,
        |  CAST(1000000 * (length(t)
        |      - length(regexp_replace(t, '[\\x20-\\x7E]', '', 'g')))
        |    // greatest(length(t), 1) AS BIGINT) AS ascii_ppm
        |FROM c ORDER BY doc_id""".stripMargin
    },
    "q121_script_mix" -> {
      import Snippets._
      val selects = TextOps.ScriptRanges.map { case (name, pat) =>
        s"  CAST(length(t) - length(regexp_replace(t, '$pat', '', 'g')) AS BIGINT) AS n_$name"
      }.mkString(",\n")
      s"""WITH c AS (
        |  SELECT doc_id,
        |    coalesce(text, '')
        |      || CASE WHEN doc_id % 4 = 0 THEN ' $cyrillic' ELSE '' END
        |      || CASE WHEN doc_id % 4 = 1 THEN ' $cjk' ELSE '' END
        |      || CASE WHEN doc_id % 4 = 2 THEN ' $arabic' ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |$selects
        |FROM c ORDER BY doc_id""".stripMargin
    },
    "q17_text_stats" ->
      s"""WITH base AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_c,
        |  CAST((length(regexp_replace(text, '[^A-Za-z]', '', 'g')) + 3) // 4
        |       + length(regexp_replace(text, '[A-Za-z\\s]', '', 'g')) AS BIGINT) AS tok_est,
        |  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE)
        |    / greatest(len(toks), 1) AS stop_ratio
        |FROM base
        |ORDER BY doc_id""".stripMargin,
    "q18_text_quality" ->
      s"""WITH base AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    len(toks) AS n,
        |    len(list_filter(toks, t -> t IN ($stopList))) AS stop_hits,
        |    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','is','to','in'))) AS en_s,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS de_s,
        |    len(list_filter(toks, t -> t IN ('le','la','et','les','des','est','une'))) AS fr_s,
        |    len(list_filter(toks, t -> t IN ('el','los','y','las','es','una','por'))) AS es_s
        |  FROM base)
        |SELECT doc_id,
        |  CAST(least(n, 40) + least(stop_hits * 5, 30) + 30 - least(punct, 30) AS BIGINT) AS quality,
        |  CAST(en_s AS BIGINT) AS en_score,
        |  CAST(de_s AS BIGINT) AS de_score,
        |  CASE
        |    WHEN es_s > en_s AND es_s > de_s AND es_s > fr_s THEN 'es'
        |    WHEN fr_s > en_s AND fr_s > de_s THEN 'fr'
        |    WHEN de_s > en_s THEN 'de'
        |    WHEN en_s > 0 THEN 'en'
        |    ELSE 'und' END AS lang_pred
        |FROM scored
        |ORDER BY doc_id""".stripMargin,
    "q19_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 3 = 0),
        |fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM corpus)
        |SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM fps GROUP BY fp ORDER BY fp""".stripMargin,
    "q20_dedup_ngram" -> ngramPairsSql,
    // MinHash+LSH emits exactly the exact-Jaccard pair set when banding
    // recall is 100% (verified on this corpus at sf0.001/sf0.01, and the
    // exact-verify stage guarantees precision) — so the exact pair set IS
    // the oracle, making the LSH path fully value-checked rather than
    // rows-only.
    "q21_minhash_lsh" -> ngramPairsSql,
    "q22_simhash" -> simhashSql,
    "q25_sim_lsh" -> lshSql,
    "q55_embed_dup" -> embedDupSql,
    "q64_lang_ngram" -> langNgramSql,
    "q56_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |u AS (
        |  SELECT doc_id, t, count(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM base) GROUP BY doc_id, t),
        |uni AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(n) AS BIGINT) AS top_uni
        |  FROM u GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, b, count(*) AS n FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(0, greatest(len(toks) - 2, 0)),
        |      i -> array_to_string(toks[i+1:i+2], ' '))) AS b FROM base)
        |  GROUP BY doc_id, b),
        |bi AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |    CAST(max(n) AS BIGINT) AS top_bi
        |  FROM bg GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct,
        |  CAST(top_uni AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_unigram_frac,
        |  CAST(top_bi AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
        |  CAST(n_tokens - n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_unigram_frac,
        |  (top_uni * 5 <= n_tokens AND top_bi * 2 <= n_bigrams
        |   AND (n_tokens - n_distinct) * 10 <= n_tokens * 7) AS keep
        |FROM uni JOIN bi USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q63_curation" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 4 = 0),
        |toked AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM corpus),
        |pass AS (
        |  SELECT doc_id, text, toks FROM toked
        |  WHERE len(toks) BETWEEN 10 AND 1000
        |    AND length(regexp_replace(text, '\\s', '', 'g')) >= len(toks) * 3
        |    AND length(regexp_replace(text, '\\s', '', 'g')) <= len(toks) * 10
        |    AND len(list_filter(toks, x -> x IN ($stopList))) > 0
        |    AND len(list_filter(toks, x -> x IN ('slow'))) = 0
        |    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 5 >= length(text) * 4),
        |dedup AS (
        |  SELECT doc_id, toks FROM (
        |    SELECT doc_id, toks, row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |    FROM pass) t WHERE rn = 1),
        |st AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    unnest(list_filter(list_transform(
        |      generate_series(0, len(toks) // 48), i -> i * 48),
        |      s -> s < len(toks))) AS s
        |  FROM dedup)
        |SELECT doc_id,
        |  CAST(s // 48 AS BIGINT) AS chunk_id,
        |  CAST(least(n - s, 64) AS BIGINT) AS chunk_tokens,
        |  array_to_string(toks[s+1:s+64], ' ') AS chunk_text
        |FROM st
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q65_line_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 4 = 0),
        |built AS (
        |  SELECT doc_id,
        |    concat('=== shared header ===', chr(10),
        |      CASE WHEN doc_id % 3 = 0 THEN 'cookie banner accept'
        |           ELSE concat('intro ', CAST(doc_id AS VARCHAR)) END, chr(10),
        |      text, chr(10),
        |      CASE WHEN doc_id % 5 = 0 THEN 'footer contact us'
        |           ELSE concat('outro ', CAST(doc_id AS VARCHAR)) END) AS text
        |  FROM corpus),
        |src AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM built),
        |l2 AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ls))) AS line_no,
        |    unnest(ls) AS line
        |  FROM src),
        |freq AS (
        |  SELECT line FROM l2 GROUP BY line HAVING count(DISTINCT doc_id) >= 5),
        |kept AS (
        |  SELECT doc_id, line_no, line FROM l2
        |  WHERE line NOT IN (SELECT line FROM freq)),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text,
        |    CAST(count(*) AS BIGINT) AS n_lines_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT b.doc_id, coalesce(a.text, '') AS text,
        |  CAST(coalesce(a.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
        |  CAST(len(string_split(b.text, chr(10))) AS BIGINT) AS n_lines_total
        |FROM built b LEFT JOIN agg a ON b.doc_id = a.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q60_winnow" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, length(text)),
        |      j -> CAST(ord(substring(text, j, 1)) AS BIGINT)) AS chars,
        |    length(text) AS len
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(generate_series(0, greatest(len - 8, 0)),
        |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), chars[i+1:i+8]),
        |         (acc, ch) -> (acc * 257 + ch) % 2147483647)) AS grams
        |  FROM c),
        |w AS (
        |  SELECT doc_id, list_transform(generate_series(0, greatest(len(grams) - 4, 0)),
        |    j -> list_aggregate(grams[j+1:j+4], 'min')) AS wins
        |  FROM g)
        |SELECT doc_id, CAST(unnest(list_distinct(wins)) AS BIGINT) AS fp
        |FROM w
        |ORDER BY doc_id, fp""".stripMargin,
    "q57_quality_gate" ->
      s"""WITH base AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  len(toks) BETWEEN 10 AND 1000 AS ok_len,
        |  (length(regexp_replace(text, '\\s', '', 'g')) >= len(toks) * 3 AND
        |   length(regexp_replace(text, '\\s', '', 'g')) <= len(toks) * 10) AS ok_word_len,
        |  len(list_filter(toks, x -> x IN ($stopList))) > 0 AS has_stop,
        |  len(list_filter(toks, x -> x IN ('slow'))) = 0 AS no_block,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 5 >= length(text) * 4 AS ok_alpha,
        |  (len(toks) BETWEEN 10 AND 1000 AND
        |   length(regexp_replace(text, '\\s', '', 'g')) >= len(toks) * 3 AND
        |   length(regexp_replace(text, '\\s', '', 'g')) <= len(toks) * 10 AND
        |   len(list_filter(toks, x -> x IN ($stopList))) > 0 AND
        |   len(list_filter(toks, x -> x IN ('slow'))) = 0 AND
        |   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 5 >= length(text) * 4) AS keep
        |FROM base
        |ORDER BY doc_id""".stripMargin,
    "q23_sim_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id, e.embedding AS cv, q.qv,
        |    $cosineSql AS cos
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |         AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q24_sim_ivf" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qc
        |           FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id, e.embedding AS cv, q.qv,
        |    $cosineSql AS cos
        |  FROM embeddings e JOIN q ON e.label = q.qc
        |  WHERE e.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |         AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
  )
}
