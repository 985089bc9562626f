package graft.pipeline

import graft.operators.{Dedup, Sampling, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative corpus-curation pipeline — the training-data twin of the
  * config-driven ETL loads (`ConfigFiles`/`LoadRunner`): a corpus flows
  * through an ordered list of [[CurationPipeline.Step]]s, each a
  * DataFrame→DataFrame program built from the verified operator library
  * (quality gates, dedup families, decontamination, sampling, chunking).
  * Steps only ever *filter or transform* — every decision is made by the
  * same deterministic, engine-exact arithmetic the driver gates verify
  * (q19/q20/q50/q51/q52/q53/q56/q57), so a pipeline run is reproducible
  * on any cluster layout.
  *
  * Scale shape: filters compose into one plan (Catalyst fuses the
  * per-row gates into a single pass); the dedup/decontamination steps
  * are the shingle equi-join shapes from [[Dedup]] — never all-pairs.
  */
object CurationPipeline {

  sealed trait Step

  /** C4-style rule gate ([[TextOps.qualityGate]]); drops docs failing any
    * rule. */
  final case class QualityGate(stopwords: Seq[String],
                               blocklist: Seq[String] = Nil,
                               minTokens: Int = 10,
                               maxTokens: Int = 1000) extends Step

  /** Gopher-style repetition gate ([[TextOps.repetitionStats]]). */
  final case class RepetitionFilter(
      maxTopUnigram: (Int, Int) = (1, 5),
      maxTopBigram: (Int, Int) = (1, 2),
      maxDupUnigram: (Int, Int) = (7, 10)) extends Step

  /** Exact dedup: keep the lowest-id doc per text fingerprint. */
  case object ExactDedup extends Step

  /** Near-dedup: n-gram Jaccard pairs → connected components → keep only
    * each group's canonical (minimum-id) document. */
  final case class NearDedup(n: Int = 5, threshold: Double = 0.5) extends Step

  /** Benchmark decontamination: drop every corpus doc sharing at least
    * `minCommon` distinct `ngram`-shingles with the holdout corpus (the
    * eval set that must not leak into training data). */
  final case class Decontaminate(holdout: DataFrame, ngram: Int = 8,
                                 minCommon: Int = 5) extends Step

  /** Balanced quota: keep min(k, |stratum|) docs per stratum, hash-chosen
    * ([[Sampling.stratifiedQuota]]); adds `sample_rank`. */
  final case class StratifiedSample(strataCol: String, k: Int,
                                    seed: Long = 42L) extends Step

  /** Stable train/val/test assignment by key hash; adds `split`. */
  final case class Split(splits: Seq[(String, Double)],
                         seed: Long = 42L) extends Step

  /** Sliding-window chunking ([[TextOps.chunkTokens]]) — terminal step:
    * the output rows are chunks, not documents. */
  final case class Chunk(size: Int, stride: Int) extends Step

  /** Statistical-LM fluency gate ([[TextOps.bigramFluency]]): the model
    * self-trains on the incoming corpus, docs below `minPpm` (or too
    * short to score) are dropped. */
  final case class FluencyGate(minPpm: Double = 30000.0) extends Step

  /** Cross-document boilerplate removal ([[Dedup.lineDedup]]): lines
    * appearing in ≥ `minDocs` docs are stripped; the text column is
    * REPLACED by the cleaned text (a transform, not a filter). */
  final case class LineDedup(minDocs: Int = 5) extends Step

  /** Data-driven construction — the curation twin of `ConfigFiles.
    * bootLoads`, so a pipeline ships as configuration: `steps` is a comma
    * list (quality, repetition, exact_dedup, near_dedup, decontaminate,
    * sample, split, chunk, fluency, line_dedup), parameterized by dotted keys like
    * `quality.minTokens=10` or `split.weights=train:0.8,val:0.1,test:0.1`.
    * `holdout` supplies the eval corpus a `decontaminate` step screens
    * against. */
  def fromConfig(conf: Map[String, String],
                 holdout: Option[DataFrame] = None): Seq[Step] = {
    def i(k: String, d: Int) = conf.get(k).map(_.trim.toInt).getOrElse(d)
    def l(k: String, d: Long) = conf.get(k).map(_.trim.toLong).getOrElse(d)
    def d0(k: String, d: Double) = conf.get(k).map(_.trim.toDouble).getOrElse(d)
    def list(k: String) = conf.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    def weights(k: String, d: Seq[(String, Double)]) = conf.get(k).map {
      _.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { pair =>
        pair.split(":") match {
          case Array(name, w) => name.trim -> w.trim.toDouble
          case _ => throw new IllegalArgumentException(s"bad split weight '$pair'")
        }
      }
    }.getOrElse(d)
    conf.getOrElse("steps", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case "quality" => QualityGate(list("quality.stopwords"),
        list("quality.blocklist"), i("quality.minTokens", 10),
        i("quality.maxTokens", 1000))
      case "repetition" => RepetitionFilter()
      case "exact_dedup" => ExactDedup
      case "near_dedup" => NearDedup(i("near_dedup.n", 5),
        d0("near_dedup.threshold", 0.5))
      case "decontaminate" => Decontaminate(
        holdout.getOrElse(throw new IllegalArgumentException(
          "decontaminate step needs a holdout corpus")),
        i("decontaminate.ngram", 8), i("decontaminate.minCommon", 5))
      case "sample" => StratifiedSample(conf.getOrElse("sample.strataCol", "lang"),
        i("sample.k", 100), l("sample.seed", 42L))
      case "split" => Split(weights("split.weights",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)), l("split.seed", 42L))
      case "chunk" => Chunk(i("chunk.size", 64), i("chunk.stride", 48))
      case "fluency" => FluencyGate(d0("fluency.minPpm", 30000.0))
      case "line_dedup" => LineDedup(i("line_dedup.minDocs", 5))
      case other => throw new IllegalArgumentException(s"unknown curation step: $other")
    }
  }

  /** Run `steps` in order over `corpus`. Filters preserve the incoming
    * columns; [[Split]]/[[StratifiedSample]] add their marker column;
    * [[Chunk]] (if present) must be last. */
  def run(corpus: DataFrame, idCol: String, textCol: String,
          steps: Seq[Step]): DataFrame = {
    steps.dropRight(1).foreach(s => require(!s.isInstanceOf[Chunk],
      "Chunk transforms docs into chunks and must be the last step"))
    steps.foldLeft(corpus) { (docs, step) =>
      step match {
        case QualityGate(sw, bl, mn, mx) =>
          val keep = TextOps.qualityGate(
              docs.select(col(idCol), col(textCol)), idCol, textCol, sw, bl, mn, mx)
            .filter(col("keep")).select(col(idCol))
          docs.join(keep, Seq(idCol), "left_semi")

        case RepetitionFilter(tu, tb, du) =>
          val keep = TextOps.repetitionStats(
              docs.select(col(idCol), col(textCol)), idCol, textCol, tu, tb, du)
            .filter(col("keep")).select(col(idCol))
          docs.join(keep, Seq(idCol), "left_semi")

        case ExactDedup =>
          val keep = Dedup.exact(docs, idCol, textCol)
            .select(col("keep_id").as(idCol))
          docs.join(keep, Seq(idCol), "left_semi")

        case NearDedup(n, th) =>
          // borrow the pair generator's shingle cache only for the eager
          // dupGroups propagation (its result labels are checkpointed, so
          // the returned plan no longer reads the pairs) — a long-lived
          // session doesn't accumulate the cache across pipeline runs
          val canonical = Dedup.ngramJaccardPairsScoped(docs, idCol, textCol, n, th)
            .use(pairs => Dedup.dupGroups(docs, idCol, pairs))
            .filter(col("is_canonical")).select(col("id").as(idCol))
          docs.join(canonical, Seq(idCol), "left_semi")

        case Decontaminate(holdout, n, minCommon) =>
          // shingles hashed to 64 bits before the distincts and the
          // overlap join (the q20/q53 discipline, guide §2.3: the
          // exchanges carry longs, not n-gram strings)
          val corpusSh = docs
            .select(col(idCol),
              explode(Dedup.shingleHashArr(col(textCol), n, poly = false)).as("sh"))
            .distinct()
          val holdSh = holdout
            .select(explode(Dedup.shingleHashArr(col(textCol), n, poly = false)).as("sh"))
            .distinct()
          val contaminated = corpusSh.join(holdSh, "sh")
            .groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
            .filter(col("__n") >= minCommon).select(col(idCol))
          docs.join(contaminated, Seq(idCol), "left_anti")

        case StratifiedSample(sc, k, seed) =>
          Sampling.stratifiedQuota(docs, sc, idCol, k, seed)

        case Split(splits, seed) =>
          Sampling.withSplit(docs, idCol, splits, seed)

        case Chunk(size, stride) =>
          TextOps.chunkTokens(docs, idCol, textCol, size, stride)

        case FluencyGate(minPpm) =>
          val keep = TextOps.bigramFluency(
              docs.select(col(idCol), col(textCol)), idCol, textCol)
            .filter(col("fluency").isNotNull && col("fluency") >= minPpm)
            .select(col(idCol))
          docs.join(keep, Seq(idCol), "left_semi")

        case LineDedup(minDocs) =>
          val cleaned = Dedup.lineDedup(
              docs.select(col(idCol), col(textCol)), idCol, textCol, minDocs)
            .select(col(idCol), col(textCol))
          docs.drop(textCol).join(cleaned, Seq(idCol))
      }
    }
  }
}
