package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * pure Column expressions (codegen'd, no UDFs) so they run inside
  * whole-stage codegen over a 100 TB corpus — per-row cost only, no
  * shuffles.
  */
object TextOps {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword estimate: letter runs count ~1 token per 4 chars
    * (ceil), digits and punctuation 1 each — a standard cheap
    * chars-per-token heuristic. */
  def tokenEstimate(text: Column): Column = {
    val letterChars = length(regexp_replace(text, "[^A-Za-z]", ""))
    val other = length(regexp_replace(text, "[A-Za-z\\s]", ""))
    // integer ceil-div keeps the estimate engine-exact
    floor((letterChars + lit(3)).cast("double") / 4.0).cast("long") + other.cast("long")
  }

  /** Ratio of tokens found in `words` (e.g. stopwords) — array_intersect-free
    * so duplicated stopwords still count. */
  def wordRatio(text: Column, words: Seq[String]): Column = {
    val hits = matchCount(text, words)
    hits.cast("double") / greatest(size(tokens(text)), lit(1)).cast("double")
  }

  /** Native codegen'd token-in-set counting ([[graft.plans.TokenMatchCount]]
    * — semantics of `size(filter(tokens(text), isin(words)))`, ~one order
    * of magnitude faster per row than the interpreted lambda tree). */
  def matchCount(text: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.TokenMatchCount(GraftColumnBridge.expression(text), words))
  }

  /** Punctuation count (non-alphanumeric, non-space chars). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Quality heuristics (length / punctuation / stopword balance), on a
    * 0-100 integer scale computed with exact integer/rational arithmetic so
    * the score is engine-independent. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text)
    val lenScore = least(n, lit(40))                          // up to 40 pts
    val stopHits = matchCount(text, stopwords)
    val stopScore = least(stopHits * 5, lit(30))              // up to 30 pts
    val punct = punctCount(text)
    val punctPenalty = least(punct, lit(30))                  // up to -30 pts
    (lenScore + stopScore + lit(30) - punctPenalty).cast("long")
  }

  /** Marker-word language ID: score per language = marker-token hits;
    * highest score wins, first-listed wins ties, zero everywhere → "und"
    * (undetermined). CJK characters short-circuit to "zh". */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "los", "y", "las", "es", "una", "por"))

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) => lang -> matchCount(text, words) }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val hasCjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    val best = scores.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
    when(hasCjk, lit("zh")).otherwise(best)
  }

  /** Encoding-health stats for web-scale corpora — the screen that
    * catches mojibake (UTF-8 bytes decoded as Latin-1), lossy
    * transcoding (U+FFFD replacement chars) and binary-contaminated text
    * (stray control chars) before they poison dedup fingerprints and
    * tokenizers. All counts are exact integers from codegen'd regex
    * splits, so a SQL oracle replays them bit-exactly (q120).
    *
    * Returned columns: `n_repl` (U+FFFD count), `n_ctrl` (C0 controls
    * minus tab/newline/CR), `n_moji` (common UTF-8-as-Latin-1 artifact
    * sequences), `n_ascii` (printable-ASCII char count — callers derive
    * ratios with exact integer `div`, q120). */
  // Constructed, not typed: each artifact is the cp1252 MIS-decode of a
  // real character's UTF-8 bytes (the mojibake mechanism itself), so the
  // source stays encoding-safe and the set is prefix-free by byte length
  // (regex alternation then matches identical spans under Java's
  // leftmost-first and the oracle's RE2).
  val MojibakeArtifacts: Seq[String] =
    "\u00e9\u00e8\u00fc\u00e4\u00f6\u00df\u00f1\u00e7\u2019\u201c\u2013\u2014\u2026\u00b0\u00a0"
      .map(ch => new String(ch.toString.getBytes("UTF-8"), "windows-1252"))
  def encodingStats(text: Column): Seq[(String, Column)] = {
    def matches(pattern: String): Column =
      (size(split(text, pattern, -1)) - 1).cast("long")
    val mojiPattern = MojibakeArtifacts
      .map(java.util.regex.Pattern.quote).mkString("|")
    Seq(
      "n_repl" -> matches("\\uFFFD"),
      "n_ctrl" -> matches("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"),
      "n_moji" -> matches(mojiPattern),
      "n_ascii" -> (length(text) -
        length(regexp_replace(text, "[\\x20-\\x7E]", ""))).cast("long"))
  }

  /** Unicode script composition — the multilingual-corpus datasheet
    * metric (how much Latin/Cyrillic/Greek/CJK/Arabic/Hangul a document
    * carries) and the guard that catches script-mixing spam. Counts are
    * exact character-class tallies (length-difference of a codegen'd
    * `regexp_replace`); the `\x{...}` range syntax is shared by Java
    * regex and the oracle's RE2, so q121 value-checks every count. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]")
  def scriptCounts(text: Column): Seq[(String, Column)] =
    ScriptRanges.map { case (name, pattern) =>
      s"n_$name" ->
        (length(text) - length(regexp_replace(text, pattern, ""))).cast("long")
    }

  /** Canonical text normalization for fingerprinting: lowercase + collapse
    * whitespace. */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Document fingerprint: md5 of normalized text — stable across engines,
    * partition-parallel, and joinable for exact dedup. */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Unicode NFC canonical composition (codegen'd
    * [[graft.plans.NfcNormalize]]) — run BEFORE [[fingerprint]] when the
    * corpus mixes precomposed and combining-mark encodings of the same
    * text, or `é` and `e`+U+0301 dedupe as different documents. DuckDB's
    * `nfc_normalize` implements the same Unicode algorithm, so oracles
    * replay it directly. */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.NfcNormalize(GraftColumnBridge.expression(text)))
  }

  /** Order-sensitive rolling token hash (polynomial over 64-bit lanes) —
    * cheap near-id for shingles; Scala-side twin of [[Dedup.shingleHash]].
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(1000003L) + xxhash64(t))

  /** PII scrubbing for training corpora: emails, IPv4 addresses and
    * international-format phone numbers replaced by stable placeholder
    * tokens (redaction must be deterministic so dedup/fingerprints stay
    * consistent across reruns). Pure `regexp_replace` chain — codegen'd,
    * no UDF; patterns are conservative on purpose (precision over recall,
    * like production scrubbers' first pass). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\b"
  val PhoneRe = "\\+\\d{1,3}[- ]?\\d{2,4}[- ]?\\d{3,4}[- ]?\\d{2,4}"
  val IbanRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{12,30}\\b"
  val CardRe = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"

  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    val noPhone = regexp_replace(noIp, PhoneRe, "<PHONE>")
    val noIban = regexp_replace(noPhone, IbanRe, "<IBAN>")
    regexp_replace(noIban, CardRe, "<CARD>")
  }

  /** Count of PII hits by class (for corpus-quality reporting). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "email" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    "ip"    -> size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long"),
    "phone" -> size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"),
    "iban"  -> size(regexp_extract_all(text, lit(IbanRe), lit(0))).cast("long"),
    "card"  -> size(regexp_extract_all(text, lit(CardRe), lit(0))).cast("long"))

  /** Sliding-window document chunking (context-window prep): one row per
    * chunk of `chunkSize` tokens advancing by `stride` (overlap =
    * chunkSize − stride). Pure Column program — the explode is the only
    * row amplification, everything stays in whole-stage codegen, and
    * `chunk_id = start/stride` is derivable (no ordinal dependence on
    * execution order). Emits (idCol, chunk_id, chunk_tokens, chunk_text).
    */
  /** Winnowing document fingerprints (the MOSS local-sketch algorithm,
    * re-derived): polynomial hashes of the character k-grams, minimum per
    * sliding window of `w` consecutive gram hashes, distinct minima = the
    * document's sketch. Near-identical documents share most sketch values,
    * so a sketch equi-join finds copied passages — position-robust, unlike
    * whole-text fingerprints. The sketch is one native codegen'd
    * expression ([[graft.plans.WinnowSketch]]: a tight primitive loop —
    * higher-order-function trees evaluate interpreted and were ~100×
    * slower per row); explode is the only amplification. The 31-bit
    * polynomial hash is the engine-portable [[Dedup.polyHash]] arithmetic,
    * so an oracle can recompute sketches bit-exactly. Emits (idCol, fp). */
  def winnow(df: org.apache.spark.sql.DataFrame, idCol: String,
             textCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val sketch = GraftColumnBridge.column(
      graft.plans.WinnowSketch(GraftColumnBridge.expression(col(textCol)), k, w))
    df.select(col(idCol), explode(sketch).as("fp"))
  }

  /** Character-n-gram language ID: each language's profile is the set of
    * distinct character trigrams of its marker words (computed once,
    * deterministic — also embedded as literals into oracle SQL); a
    * document scores one point per profile trigram contained in its
    * normalized text. Pure Column expressions (`contains` scans), the
    * n-gram flavor of [[langId]]'s marker heuristic. */
  def trigramProfile(words: Seq[String]): Seq[String] =
    words.flatMap(w => (0 to w.length - 3).map(i => w.substring(i, i + 3)))
      .distinct.sorted

  def langScoreNgram(text: Column, profile: Seq[String]): Column = {
    val norm = lower(text)
    profile.map(t => when(norm.contains(t), 1).otherwise(0))
      .reduce(_ + _).cast("long")
  }

  /** Gopher-style repetition statistics (the repetition filters of the
    * large-corpus curation recipe, re-derived): per document the
    * most-frequent-unigram fraction, most-frequent-bigram fraction, and
    * duplicate-unigram fraction, plus a `keep` gate. Thresholds are
    * rationals applied by integer cross-multiplication — no float
    * comparisons, so the gate is bit-stable across engines. Two
    * explode→count shapes (shuffle on (id, gram), partial-agg friendly);
    * the reported fractions are exact int/int double divisions. */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String,
                      maxTopUnigram: (Int, Int) = (1, 5),
                      maxTopBigram: (Int, Int) = (1, 2),
                      maxDupUnigram: (Int, Int) = (7, 10)): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    val uni = base.select(col("id"), explode(col("toks")).as("t"))
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("n"))
      .groupBy(col("id"))
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"), max(col("n")).as("top_uni"))
    // bigram i = tokens[i .. i+1]; single-token docs degenerate to the
    // token itself (mirrored verbatim in the oracle arithmetic). Native
    // codegen'd windows ([[graft.plans.TokenNgrams]]) — the declarative
    // transform/sequence/slice tree evaluated interpreted per window
    val bigramArr = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.plans.TokenNgrams(
        GraftColumnBridge.expression(col("toks")), 2))
    }
    val bi = base.select(col("id"), explode(bigramArr).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col("id"))
      .agg(sum(col("n")).cast("long").as("n_bigrams"), max(col("n")).as("top_bi"))
    uni.join(bi, "id")
      .select(col("id").as(idCol), col("n_tokens"), col("n_distinct"),
        (col("top_uni").cast("double") / col("n_tokens").cast("double"))
          .as("top_unigram_frac"),
        (col("top_bi").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        ((col("n_tokens") - col("n_distinct")).cast("double")
          / col("n_tokens").cast("double")).as("dup_unigram_frac"),
        (col("top_uni") * maxTopUnigram._2 <= col("n_tokens") * maxTopUnigram._1 &&
          col("top_bi") * maxTopBigram._2 <= col("n_bigrams") * maxTopBigram._1 &&
          (col("n_tokens") - col("n_distinct")) * maxDupUnigram._2
            <= col("n_tokens") * maxDupUnigram._1).as("keep"))
  }

  /** C4-style rule-based quality gate (the web-corpus cleaning recipe,
    * re-derived for this corpus): token-count bounds, mean-token-length
    * bounds, stopword presence, blocklist absence, alphabetic-character
    * floor. Every rule is a pure per-row Column expression decided by
    * integer arithmetic — zero shuffles, whole-stage codegen, engine-exact
    * booleans. Emits one row per document with the individual rule
    * verdicts (for curation dashboards) and the conjunction `keep`. */
  def qualityGate(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, stopwords: Seq[String],
                  blocklist: Seq[String], minTokens: Int = 10,
                  maxTokens: Int = 1000): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("long")
    val tokChars = length(regexp_replace(t, "\\s", "")).cast("long")
    val alpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    df.select(col(idCol),
        nTok.as("n_tokens"),
        (nTok >= minTokens && nTok <= maxTokens).as("ok_len"),
        (tokChars >= nTok * 3 && tokChars <= nTok * 10).as("ok_word_len"),
        (matchCount(t, stopwords) > 0).as("has_stop"),
        (matchCount(t, blocklist) === 0).as("no_block"),
        (alpha * 5 >= length(t).cast("long") * 4).as("ok_alpha"))
      .withColumn("keep", col("ok_len") && col("ok_word_len") &&
        col("has_stop") && col("no_block") && col("ok_alpha"))
  }

  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val toks = tokens(col(textCol))
    val n = size(toks)
    val starts = filter(
      transform(sequence(lit(0), (n.cast("long") / stride).cast("int")),
        i => i * stride),
      s => s < n)
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        explode(starts).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("long").as("chunk_id"),
        least(col("__n") - col("__s"), lit(chunkSize)).cast("long").as("chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("__s") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Token co-occurrence lift: for token pairs appearing together in at
    * least `minPairDocs` documents, the association strength
    * `lift_ppm = ⌊10⁶ · n_xy · N / (n_x · n_y)⌋` (parts-per-million of
    * P(x,y)/(P(x)P(y)) — the PMI argument in ALL-INTEGER arithmetic, so
    * the gate is exact where a float log would differ by ulps across
    * engines). The pair space is Σ_doc (distinct tokens)² — bounded by
    * document length, so it scales linearly with corpus size; the
    * doc-count relation and the scalar N broadcast.
    *
    * @return (tok_a, tok_b, n_xy, lift_ppm), tok_a < tok_b.
    */
  def cooccurLift(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, minPairDocs: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(tokens(col(textCol)))).as("t"))
    val nDocs = df.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val nX = toks.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val pairs = toks.select(col("id"), col("t").as("tok_a"))
      .join(toks.select(col("id"), col("t").as("tok_b")), Seq("id"))
      .filter(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minPairDocs)
    pairs
      .join(broadcast(nX.select(col("t").as("tok_a"), col("n").as("n_x"))), "tok_a")
      .join(broadcast(nX.select(col("t").as("tok_b"), col("n").as("n_y"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .withColumn("lift_ppm", expr("(1000000 * n_xy * n_docs) div (n_x * n_y)"))
      .select(col("tok_a"), col("tok_b"), col("n_xy"), col("lift_ppm"))
  }

  /** Character-bigram positions of the normalized text: one row per
    * adjacent character pair. The bigram relation under [[bigramFluency]].
    */
  private def charBigrams(df: org.apache.spark.sql.DataFrame,
                          idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    // one native pass builds the per-doc gram array (normalization +
    // windows, [[graft.plans.CharNgrams]]); exploding POSITIONS first
    // copied the whole normalized string into every gram row — 44 s vs
    // ~1 s for this shape at sf0.1
    val grams = GraftColumnBridge.column(graft.plans.CharNgrams(
      GraftColumnBridge.expression(col(textCol)), 2))
    df.select(col(idCol).as("id"), explode(grams).as("g"))
  }

  /** Statistical-LM fluency scoring — the KenLM-filter shape of corpus
    * curation, self-trained: character-bigram counts are aggregated over
    * the whole corpus (one bounded groupBy — the model is capped by
    * alphabet², so it broadcasts), then every document is scored by the
    * average conditional frequency of its adjacent character pairs.
    *
    * Per position with bigram g = c₁c₂ the credit is the integer
    *   ⌊10⁶ · count(c₁c₂) / count(c₁·)⌋   (count over the corpus),
    * i.e. parts-per-million of P(c₂|c₁). All-integer arithmetic makes the
    * per-doc sum order-independent and bit-exact across engines; the
    * emitted `fluency` is the exact double division sum/n. Gibberish and
    * wrong-language docs score low; the score is a drop-in quality-gate
    * column alongside [[qualitySignals]].
    *
    * Scale shape: train = one map-side-combinable groupBy bounded by the
    * alphabet; score = broadcast join of the model + one per-doc
    * aggregation. No shuffle grows with corpus size except the per-doc
    * agg, which is the minimum possible.
    *
    * @return (idCol, n_bigrams, fluency) for every input doc; fluency is
    *         null for docs shorter than 2 normalized chars.
    */
  def bigramFluency(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    val grams = charBigrams(df, idCol, textCol)
    val c2 = grams.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val model = c2
      .withColumn("c1",
        sum(col("c2")).over(Window.partitionBy(substring(col("g"), 1, 1))))
      .withColumn("credit", expr("(1000000 * c2) div c1"))
      .select(col("g"), col("credit"))
    val scored = grams
      .join(broadcast(model), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("credit")).as("__sum"))
      .select(col("id"), col("n_bigrams"),
        (col("__sum").cast("double") / col("n_bigrams")).as("fluency"))
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("fluency"))
  }

  /** Normalized word form shared by the word-level corpus operators:
    * lowercase, every non-alphanumeric run collapsed to one space, then
    * trimmed — so a single-space split yields the token array with no
    * empty tokens (identical in any engine, no split-semantics edge
    * cases). */
  private def normWords(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Exact duplicated-span detection (the exact-substring complement of
    * the MinHash/SimHash near-dup family, after Lee et al., "Deduplicating
    * Training Data Makes Language Models Better"): fixed-length character
    * windows anchored at WORD STARTS of the normalized text; a window that
    * occurs in ≥2 DISTINCT documents marks boilerplate / copied spans.
    * Word-start anchors are content-defined, so a span copied to any
    * offset of another document samples the same windows there — a fixed
    * stride would only catch copies that happen to land stride-aligned.
    *
    * Scale shape: windows are extracted AND fingerprinted to 8-byte keys
    * in one native codegen pass ([[graft.plans.AnchorWindowHashes]] —
    * polynomial fold mod 2⁴³−57, SQL-replayable; the declarative
    * sequence-explode + substr tree carried the full text into every
    * position row, 4.6 s vs ~1 s at sf0.1). The duplicate test is a
    * whole-partition window over the fingerprint with
    * `min(id) <> max(id)` instead of a count-distinct — 2 longs of state
    * per key, and the per-row verdict rides the same exchange, so no
    * join-back of the window relation is needed. The per-doc rollup is
    * the minimal second shuffle. Windows/doc ≈ word count → the exchange
    * is ~16 bytes per corpus token; fingerprint collisions are ~1 per
    * 10¹³ window pairs (use two independent folds at 100 TB). One skew
    * caveat: a whole-partition window puts every row of one fingerprint
    * in one task, so a boilerplate span shared by millions of documents
    * makes a hot task — at that skew, flip to the partial-aggregated
    * `groupBy(h).agg(min,max)` + equi-join-back (one more exchange, but
    * the hot key streams through the join's probe side instead of
    * pinning a window task).
    *
    * @return (idCol, n_windows, n_dup_windows, dup_ppm) for every doc with
    *         at least one full window; dup_ppm = ⌊10⁶·dup/windows⌋.
    */
  def spanDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val hashes = GraftColumnBridge.column(graft.plans.AnchorWindowHashes(
      GraftColumnBridge.expression(normWords(col(textCol))), k))
    val wins = df.select(col(idCol).as("id"), explode(hashes).as("h"))
    val byHash = Window.partitionBy(col("h"))
    wins
      .withColumn("is_dup",
        min(col("id")).over(byHash) =!= max(col("id")).over(byHash))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_ppm", expr("(1000000 * n_dup_windows) div n_windows"))
      .select(col("id").as(idCol), col("n_windows"), col("n_dup_windows"),
        col("dup_ppm"))
  }

  /** Collocation extraction — adjacent word pairs ranked by a PMI-shaped
    * lift in exact parts-per-million: lift_ppm = ⌊10⁶·c(xy)·N / (c(x)·c(y))⌋
    * with c over corpus token positions and N the corpus token count.
    * Pairs occurring under `minCount` times are noise and dropped before
    * the ratio (also what keeps the numerator product within int64 —
    * at larger corpora compute the credit per-million in two staged
    * divisions or on DECIMAL(38,0)).
    *
    * Scale shape: pair counting is one map-side-combinable groupBy on the
    * (w1,w2) key; unigram counts are a second bounded-by-vocabulary
    * groupBy that broadcasts back onto the surviving pairs. Nothing holds
    * per-document state. The unigram broadcast assumes the vocabulary
    * fits an executor (fine into the tens of millions of words); past
    * that, reverse the join — the minCount-surviving PAIR relation is
    * the small side of a shuffled join on the word key.
    */
  def collocations(df: org.apache.spark.sql.DataFrame, textCol: String,
                   minCount: Int, topN: Int): org.apache.spark.sql.DataFrame = {
    val toks = df
      .select(posexplode(split(normWords(col(textCol)), " ")).as(Seq("i", "w")))
      .filter(col("w") =!= "")
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val nTot = toks.agg(count(lit(1)).as("n_tokens"))
    val pairs = df
      .select(split(normWords(col(textCol)), " ").as("ws"))
      // sequence(1, 0) DESCENDS in Spark — a 1-token doc must be dropped
      // before the adjacency generator, not patched after
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "filter(transform(sequence(1, size(ws) - 1), " +
          "i -> struct(ws[i - 1] AS w1, ws[i] AS w2)), " +
          "p -> p.w1 <> '' AND p.w2 <> '')")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n").as("n_x"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n").as("n_y"))), "w2")
      .crossJoin(broadcast(nTot))
      .withColumn("lift_ppm",
        expr("(1000000 * n_xy * n_tokens) div (n_x * n_y)"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(topN)
      .select(col("w1"), col("w2"), col("n_xy"), col("lift_ppm"))
  }

  /** Character symbol array of a normalized word ("abc" → [a, b, c]) —
    * the unit the BPE operators merge over. */
  private def charSyms(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** One true BPE merge round over a symbol-array column
    * ([[graft.plans.BpeMergePairs]] — leftmost non-overlapping, the
    * array walk; string-replace formulations get symbol boundaries or
    * overlap chains wrong, see the expression's doc). */
  private def mergeSyms(syms: Column, s1: String, s2: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.plans.BpeMergePairs(
      GraftColumnBridge.expression(syms), s1, s2))
  }

  /** Adjacent symbol pairs of a symbol-array column, weighted by `freq`,
    * as (s1, s2, n) — shared by the train rounds. */
  private def pairCounts(vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i - 1] AS s1, syms[i] AS s2))")).as("p"),
        col("freq"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(sum(col("freq")).as("n"))

  /** Iterated BPE training — `rounds` actual merge rounds, not just the
    * first-pair table: the vocabulary's words are held as symbol arrays,
    * each round counts adjacent symbol pairs weighted by word frequency,
    * picks the max (ties by pair), and applies the merge with the exact
    * leftmost-non-overlapping walk ([[graft.plans.BpeMergePairs]]).
    *
    * Scale shape: everything after tokenization operates on the VOCABULARY
    * relation (distinct word × freq — bounded, cached for the loop); each
    * round is one map-side-combinable pair count and a 1-row argmax
    * collect (the learned merge — bounded driver state, the k-means
    * codebook precedent). A 50k-merge production run is this same loop;
    * batch pair-count maintenance (only words containing the merged pair
    * change) is the standard incremental refinement.
    *
    * @return one row per round: (round, sym1, sym2, n).
    */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
               rounds: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val vocab = df
      .select(explode(split(normWords(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(charSyms(col("w")).as("syms"), col("freq"))
      .persist()
    try {
      var cur = vocab.select(col("syms"), col("freq"))
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      for (r <- 1 to rounds) {
        val top = pairCounts(cur)
          .orderBy(col("n").desc, col("s1"), col("s2"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (s1, s2, n) = (top(0).getString(0), top(0).getString(1),
            top(0).getLong(2))
          merges += ((r, s1, s2, n))
          cur = cur.withColumn("syms", mergeSyms(col("syms"), s1, s2))
        }
      }
      import spark.implicits._
      merges.result().toDF("round", "sym1", "sym2", "n")
        .select(col("round").cast("long").as("round"), col("sym1"),
          col("sym2"), col("n"))
        .orderBy(col("round"))
    } finally vocab.unpersist()
  }

  /** Apply learned BPE merges and count the resulting tokens per doc —
    * the other half of the [[bpeTrain]] loop. The merges are applied on
    * the DISTINCT-WORD relation (char-space each word, then the merge
    * replaces in training order) and the per-word token counts broadcast
    * back onto the corpus — per-document work is one join + sum, and the
    * merge application cost is bounded by vocabulary size no matter how
    * large the corpus.
    *
    * @return (idCol → id, n_words, n_bpe_tokens) per doc with ≥1 token.
    */
  def bpeApply(df: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String,
               merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    val words = df
      .select(col(idCol).as("id"),
        explode(split(normWords(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
    val spaced = words.select(col("w")).distinct()
      .withColumn("syms", charSyms(col("w")))
    val applied = merges.foldLeft(spaced) { case (d, (s1, s2)) =>
      d.withColumn("syms", mergeSyms(col("syms"), s1, s2))
    }.select(col("w"), size(col("syms")).cast("long").as("toks"))
    words.join(broadcast(applied), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("toks")).as("n_bpe_tokens"))
      .select(col("id").as(idCol), col("n_words"), col("n_bpe_tokens"))
  }

  /** Longest duplicated-span RUN per document: consecutive word-anchored
    * windows (the [[spanDedup]] relation, positions kept) that are all
    * shared with another document — the per-doc "how long is the copied
    * passage" companion to q122's "how much is copied". Runs group by the
    * classic ordinal-minus-rank trick; the whole chain is the q122 plan
    * plus one per-doc grouping.
    *
    * @return (idCol, max_run) for every doc with ≥1 window (0 = no
    *         duplicated window).
    */
  def spanDupRuns(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val hashes = GraftColumnBridge.column(graft.plans.AnchorWindowHashes(
      GraftColumnBridge.expression(normWords(col(textCol))), k))
    val wins = df.select(col(idCol).as("id"),
      posexplode(hashes).as(Seq("pos", "h")))
    val byHash = Window.partitionBy(col("h"))
    val flagged = wins.withColumn("is_dup",
      min(col("id")).over(byHash) =!= max(col("id")).over(byHash))
    val runs = flagged.filter(col("is_dup"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("pos"))))
      .groupBy(col("id"), (col("pos") - col("rn")).as("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("id")).agg(max(col("run")).as("max_run"))
    flagged.select(col("id")).distinct()
      .join(runs, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** BPE training statistics — the first-merge pair table: adjacent
    * character pairs inside words, weighted by corpus word frequency
    * (exactly the count a byte-pair-encoding trainer maximizes on its
    * first iteration). Operating on the VOCABULARY (distinct word ×
    * frequency) rather than raw text is what makes iterated BPE feasible
    * at 100 TB: the explode is bounded by Σ|vocab word lengths|, not
    * corpus size, and each further merge round is the same bounded
    * reshape of the vocab relation.
    *
    * @return top `topN` (pair, n) by weighted count, ties broken by pair.
    */
  def bpePairStats(df: org.apache.spark.sql.DataFrame, textCol: String,
                   topN: Int): org.apache.spark.sql.DataFrame = {
    val vocab = df
      .select(explode(split(normWords(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    vocab
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topN)
  }

  /** SPAN-level contamination coverage — the surgical companion to the
    * doc-level decontam gate (q53): for every `testLabel` document, how
    * many of its normalized tokens sit inside at least one `n`-gram that
    * also occurs in any `trainLabel` document. Doc-level decontam drops
    * whole documents over one shared benchmark sentence; the span measure
    * is what a redact-don't-drop policy needs.
    *
    * Positions ride the [[Dedup.shingles]] array (`posexplode` — index =
    * token offset of the window); interval union per doc is the classic
    * running-max-of-end window over hit positions, clamped to the doc's
    * token count (only the final short-doc window can overrun). Returns
    * (idCol, n_tokens, n_contam, contam_ppm) for every test doc.
    *
    * Scale shape: the candidate step is the same shingle EQUI-join as
    * q53 (never all-pairs; the train shingle set is a standing relation
    * at 100 TB), the union window partitions by doc over only the HIT
    * positions (a tiny fraction of the corpus), and the final ppm is a
    * projection. */
  def contamSpanCoverage(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, splitCol: String,
                         trainLabel: String, testLabel: String,
                         n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shingles hashed to 64 bits at the explode, so the train-side
    // distinct and the contamination join shuffle longs, not n-gram
    // strings (the q20/q53 discipline, guide §2.3); a hit is a
    // distinct-hash match — equal to the string match unless two
    // different shingles collide in 2⁶⁴ (oracle-confirmed equal here)
    val sh = docs.select(col(idCol).as("id"), col(splitCol).as("split"),
        posexplode(Dedup.shingleHashArr(col(textCol), n, poly = false)))
      .withColumnRenamed("col", "sh")
    val trainSh = sh.filter(col("split") === trainLabel)
      .select(col("sh")).distinct()
    val hits = sh.filter(col("split") === testLabel)
      .join(trainSh, "sh")
      .select(col("id"), col("pos").cast("long").as("pos"))
    val wPrev = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = hits
      .withColumn("prev_end", max(col("pos") + n).over(wPrev))
      .withColumn("add", greatest(lit(0L),
        (col("pos") + n) - greatest(col("pos"), coalesce(col("prev_end"), lit(0L)))))
      .groupBy(col("id")).agg(sum(col("add")).as("raw"))
    val testDocs = docs.filter(col(splitCol) === testLabel)
      .select(col(idCol).as("id"),
        size(split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " "))
          .cast("long").as("n_tokens"))
    testDocs.join(covered, Seq("id"), "left")
      .withColumn("n_contam", least(coalesce(col("raw"), lit(0L)), col("n_tokens")))
      .select(col("id").as(idCol), col("n_tokens"), col("n_contam"),
        expr("(1000000 * n_contam) div n_tokens").as("contam_ppm"))
  }
}
