package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-gate queries for the round-8 corpus-statistics operators:
  * exact duplicated-span detection (the substring complement of the
  * MinHash near-dup family), PMI collocation extraction, BPE first-merge
  * pair statistics, dyadic-exact EWMA over recent events, and robust
  * median/MAD outlier gating. Every float the gates emit is either
  * integer parts-per-million or an exact dyadic rational, so the DuckDB
  * oracles are value-exact — same discipline as the q83/q51 oracles.
  */
object CorpusQueries {

  /** q122: exact duplicated 40-char spans anchored at word starts
    * ([[TextOps.spanDedup]]) — boilerplate / copied-span rate per doc. */
  def q122SpanDedup(spark: SparkSession, dir: String): DataFrame =
    TextOps.spanDedup(Tables.documents(spark, dir), "doc_id", "text", k = 40)
      .orderBy(col("doc_id"))

  /** q123: adjacent-word collocations ranked by exact ppm lift,
    * pairs seen ≥5 times, top 20 ([[TextOps.collocations]]). */
  def q123Collocations(spark: SparkSession, dir: String): DataFrame =
    TextOps.collocations(Tables.documents(spark, dir), "text",
      minCount = 5, topN = 20)

  /** q124: α=½ EWMA of each user's last 16 event values in exact dyadic
    * milli-units ([[Events.ewmaRecent]]). */
  def q124Ewma(spark: SparkSession, dir: String): DataFrame =
    Events.ewmaRecent(Tables.events(spark, dir), "user_id", "ts",
        "event_id", "value", k = 16)
      .orderBy(col("user_id"))

  /** q125: BPE first-merge statistics — top 20 adjacent character pairs
    * over the frequency-weighted vocabulary ([[TextOps.bpePairStats]]). */
  def q125BpePairs(spark: SparkSession, dir: String): DataFrame =
    TextOps.bpePairStats(Tables.documents(spark, dir), "text", topN = 20)

  /** q126: robust median/MAD outlier stats per event type
    * ([[Profile.madOutliers]]). */
  def q126MadOutliers(spark: SparkSession, dir: String): DataFrame =
    Profile.madOutliers(Tables.events(spark, dir), "event_type", "value",
        k = 3)
      .orderBy(col("event_type"))

  /** q128: three REAL BPE merge rounds over the corpus vocabulary
    * ([[TextOps.bpeTrain]]) — each round's learned merge applied before
    * the next count. */
  def q128BpeTrain(spark: SparkSession, dir: String): DataFrame =
    TextOps.bpeTrain(Tables.documents(spark, dir), "text", rounds = 3)

  /** q129: longest run of consecutive duplicated 40-char spans per doc
    * ([[TextOps.spanDupRuns]]) — copied-passage length. */
  def q129SpanRuns(spark: SparkSession, dir: String): DataFrame =
    TextOps.spanDupRuns(Tables.documents(spark, dir), "doc_id", "text",
        k = 40)
      .orderBy(col("doc_id"))

  /** q130: tokenize the corpus with the q128-learned merges
    * ([[TextOps.bpeApply]]) — the apply half of the BPE loop. */
  def q130BpeApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = TextOps.bpeTrain(docs, "text", rounds = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextOps.bpeApply(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_span_dedup"   -> q122SpanDedup _,
    "q123_collocations" -> q123Collocations _,
    "q124_ewma"         -> q124Ewma _,
    "q125_bpe_pairs"    -> q125BpePairs _,
    "q126_mad_outliers" -> q126MadOutliers _,
    "q128_bpe_train"    -> q128BpeTrain _,
    "q129_span_runs"    -> q129SpanRuns _,
    "q130_bpe_apply"    -> q130BpeApply _,
  )

  /** One oracle-side BPE round over the positional symbol relation
    * `sIN` (w, freq, pos, sym): weighted adjacent-pair counts → argmax →
    * EXACT leftmost-non-overlapping merge, relationally. All candidates
    * merge when s1 ≠ s2 (overlapping candidates would force s1 = s2);
    * when s1 = s2, run-offset parity ((pos − run_start) even) picks the
    * leftmost-greedy pairs. `sOUT` is the merged relation with positions
    * renumbered. */
  private def bpeRoundSql(sIn: String, p: String, m: String,
                          cand: String, run: String, st: String,
                          sOut: String): String =
    s"""$p AS MATERIALIZED (
       |  SELECT a.sym AS s1, b.sym AS s2, CAST(sum(a.freq) AS BIGINT) AS n
       |  FROM $sIn a JOIN $sIn b ON a.w = b.w AND b.pos = a.pos + 1
       |  GROUP BY a.sym, b.sym),
       |$m AS MATERIALIZED (SELECT s1, s2, n FROM $p ORDER BY n DESC, s1, s2 LIMIT 1),
       |$cand AS MATERIALIZED (
       |  SELECT a.w, a.pos
       |  FROM $sIn a JOIN $sIn b ON a.w = b.w AND b.pos = a.pos + 1
       |  WHERE a.sym = (SELECT s1 FROM $m) AND b.sym = (SELECT s2 FROM $m)),
       |$run AS MATERIALIZED (
       |  SELECT w, pos, pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS grp
       |  FROM $sIn WHERE sym = (SELECT s1 FROM $m)),
       |$st AS MATERIALIZED (
       |  SELECT c.w, c.pos
       |  FROM $cand c
       |  JOIN $run r ON c.w = r.w AND c.pos = r.pos
       |  JOIN (SELECT w, grp, min(pos) AS run_start
       |        FROM $run GROUP BY w, grp) g
       |    ON g.w = r.w AND g.grp = r.grp
       |  WHERE (SELECT s1 FROM $m) <> (SELECT s2 FROM $m)
       |     OR (c.pos - g.run_start) % 2 = 0),
       |$sOut AS MATERIALIZED (
       |  SELECT x.w, x.freq,
       |    row_number() OVER (PARTITION BY x.w ORDER BY x.pos) AS pos,
       |    CASE WHEN stx.pos IS NOT NULL
       |         THEN (SELECT s1 || s2 FROM $m) ELSE x.sym END AS sym
       |  FROM $sIn x
       |  LEFT JOIN $st stx ON stx.w = x.w AND stx.pos = x.pos
       |  LEFT JOIN $st prv ON prv.w = x.w AND prv.pos = x.pos - 1
       |  WHERE prv.pos IS NULL)""".stripMargin

  /** Shared by the q128/q130 oracles: corpus words → per-word frequency →
    * positional symbol relation s0 → three relational merge rounds.
    * 1-char words carry no pairs, so including them (q130 needs their
    * token counts) leaves the training counts unchanged. */
  private[operators] val bpeTrainCtes: String =
    s"""WITH allw AS MATERIALIZED (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split(
       |      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
       |      ' ')) AS w
       |    FROM documents)
       |  WHERE w <> ''),
       |vw AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq
       |       FROM allw GROUP BY w),
       |s0 AS MATERIALIZED (
       |  SELECT w, freq, CAST(i AS BIGINT) AS pos,
       |    substr(w, CAST(i AS INTEGER), 1) AS sym
       |  FROM vw, unnest(range(1, CAST(length(w) AS BIGINT) + 1, 1)) AS u(i)),
       |${bpeRoundSql("s0", "p1", "m1", "c1", "r1", "st1", "s1t")},
       |${bpeRoundSql("s1t", "p2", "m2", "c2", "r2", "st2", "s2t")},
       |${bpeRoundSql("s2t", "p3", "m3", "c3", "r3", "st3", "s3t")}""".stripMargin

  val oracles: Map[String, String] = Map(
    "q122_span_dedup" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(CAST(i AS INTEGER),
        |                                     CAST(i AS INTEGER) + 39),
        |                     j -> CAST(ascii(substr(t, j, 1)) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 8796093022151) AS h
        |  FROM n, unnest(range(1, CAST(length(t) AS BIGINT) - 38, 1)) AS u(i)
        |  WHERE length(t) >= 40
        |    AND (i = 1 OR substr(t, CAST(i AS INTEGER) - 1, 1) = ' ')),
        |s AS (SELECT h, (min(doc_id) <> max(doc_id)) AS is_dup
        |      FROM w GROUP BY h)
        |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(sum(CASE WHEN s.is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_windows,
        |  (1000000 * CAST(sum(CASE WHEN s.is_dup THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(count(*) AS BIGINT) AS dup_ppm
        |FROM w JOIN s USING (h)
        |GROUP BY w.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    "q123_collocations" ->
      """WITH n AS (
        |  SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |arr AS (SELECT string_split(t, ' ') AS ws FROM n),
        |toks AS (
        |  SELECT w FROM (SELECT unnest(ws) AS w FROM arr) WHERE w <> ''),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY w),
        |ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks),
        |pairs AS (
        |  SELECT ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i AS INTEGER) + 1] AS w2
        |  FROM arr, unnest(range(1, CAST(len(ws) AS BIGINT), 1)) AS u(i)
        |  WHERE len(ws) >= 2),
        |p2 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM pairs WHERE w1 <> '' AND w2 <> ''
        |  GROUP BY w1, w2 HAVING count(*) >= 5)
        |SELECT w1, w2, n_xy,
        |  (1000000 * n_xy * nt.n_tokens) // (u1.n * u2.n) AS lift_ppm
        |FROM p2
        |JOIN uni u1 ON p2.w1 = u1.w
        |JOIN uni u2 ON p2.w2 = u2.w
        |CROSS JOIN ntot nt
        |ORDER BY lift_ppm DESC, w1, w2 LIMIT 20""".stripMargin,
    "q124_ewma" ->
      """WITH r AS (
        |  SELECT user_id, CAST(floor(value * 1000) AS BIGINT) AS v_milli,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_recent,
        |  CAST(sum(v_milli * (CAST(1 AS BIGINT) << (16 - rn))) AS BIGINT)
        |    // CAST(sum(CAST(1 AS BIGINT) << (16 - rn)) AS BIGINT) AS ewma_milli
        |FROM r WHERE rn <= 16
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q125_bpe_pairs" ->
      """WITH n AS (
        |  SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |toks AS (SELECT unnest(string_split(t, ' ')) AS w FROM n),
        |vocab AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq
        |  FROM toks WHERE length(w) >= 2 GROUP BY w),
        |p AS (
        |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
        |  FROM vocab, unnest(range(1, CAST(length(w) AS BIGINT), 1)) AS u(i))
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q126_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_type, CAST(floor(value * 1000) AS DOUBLE) AS vm
        |  FROM events),
        |med AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    quantile_cont(vm, 0.5) AS median_milli
        |  FROM v GROUP BY event_type),
        |dev AS (
        |  SELECT v.event_type, abs(v.vm - med.median_milli) AS d
        |  FROM v JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(d, 0.5) AS mad_milli
        |  FROM dev GROUP BY event_type),
        |outl AS (
        |  SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n_outliers
        |  FROM dev JOIN mad USING (event_type)
        |  WHERE d > 3 * mad_milli
        |  GROUP BY dev.event_type)
        |SELECT med.event_type, med.n, med.median_milli, mad.mad_milli,
        |  coalesce(outl.n_outliers, 0) AS n_outliers
        |FROM med
        |JOIN mad USING (event_type)
        |LEFT JOIN outl USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // three chained merge stages; each vN applies the argmax merge of pN
    // with the same literal left-to-right replace the engine uses
    "q128_bpe_train" ->
      s"""$bpeTrainCtes
        |SELECT CAST(1 AS BIGINT) AS round, s1 AS sym1, s2 AS sym2, n FROM m1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), s1, s2, n FROM m2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), s1, s2, n FROM m3
        |ORDER BY round""".stripMargin,
    // the same trained merges applied to every distinct word (the engine's
    // broadcast relation), then summed per doc
    "q130_bpe_apply" ->
      s"""$bpeTrainCtes,
        |tk AS (SELECT w, CAST(count(*) AS BIGINT) AS toks
        |       FROM s3t GROUP BY w)
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(tk.toks) AS BIGINT) AS n_bpe_tokens
        |FROM allw a JOIN tk USING (w)
        |GROUP BY a.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    "q129_span_runs" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(CAST(i AS INTEGER),
        |                                     CAST(i AS INTEGER) + 39),
        |                     j -> CAST(ascii(substr(t, j, 1)) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 8796093022151) AS h,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos
        |  FROM n, unnest(range(1, CAST(length(t) AS BIGINT) - 38, 1)) AS u(i)
        |  WHERE length(t) >= 40
        |    AND (i = 1 OR substr(t, CAST(i AS INTEGER) - 1, 1) = ' ')),
        |d AS (
        |  SELECT doc_id, pos,
        |    (min(doc_id) OVER (PARTITION BY h)
        |     <> max(doc_id) OVER (PARTITION BY h)) AS is_dup
        |  FROM w),
        |r AS (
        |  SELECT doc_id,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM d WHERE is_dup),
        |runs AS (
        |  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS run
        |  FROM r GROUP BY doc_id, grp),
        |mx AS (SELECT doc_id, max(run) AS max_run FROM runs GROUP BY doc_id)
        |SELECT ids.doc_id, coalesce(mx.max_run, 0) AS max_run
        |FROM (SELECT DISTINCT doc_id FROM w) ids
        |LEFT JOIN mx USING (doc_id)
        |ORDER BY ids.doc_id""".stripMargin,
  )
}
