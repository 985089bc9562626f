package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Plan cuts for relations read several times inside one query (inverted
  * indexes, Pregel iteration states, per-doc feature tables): without a
  * cut, per-consumer column pruning makes each reference a different
  * subtree, exchange reuse never fires, and the shared computation
  * re-executes once per consumer.
  *
  * The mechanism is selectable per session via `graft.plan.cuts`:
  *
  *  - `"checkpoint"` (default): LAZY `localCheckpoint`. CAVEAT — under
  *    AQE this is only lazy for the FINAL stage: `Dataset
  *    .localCheckpoint` materializes the RDD via `queryExecution.toRdd`,
  *    and `AdaptiveSparkPlanExec` executes every shuffle stage below the
  *    result stage right there, at PLAN-CONSTRUCTION time. In the bench
  *    that cost lands in the per-query `prepare` bucket, not the timed
  *    exec — judge any change to a cut relation on exec+prepare, never
  *    exec alone. Checkpoint blocks are non-replicated and lineage is
  *    discarded, so on a multi-node cluster an executor loss makes the
  *    job unrecoverable — acceptable for interactive analytics; a
  *    long-running 100 TB pipeline should run with `persist` (lineage
  *    kept, recompute on loss) or a reliable `checkpoint` directory.
  *  - `"persist"`: `MEMORY_AND_DISK` cache. Keeps lineage (fault
  *    tolerant), is CacheManager-managed (`spark.catalog.clearCache`
  *    frees it), and materializes inside the first action (no
  *    plan-construction phase shift). The logical plan is NOT truncated,
  *    so the plan-size relief the iterative operators (pageRank/HITS)
  *    need — rank_k's subtree nests rank_{k-1}'s whole tree — does not
  *    apply; planning cost grows with iteration count.
  *  - `"off"`: identity — every consumer re-executes the subtree, and
  *    the FULL operator tree stays visible in the static plan.
  *    PlanAudit and PlanDump run in this mode: a checkpoint replaces
  *    the subtree with a `Scan ExistingRDD` stub, which had made the
  *    blocked-join / partial-agg audits on q133/q146/q164-style plans
  *    vacuously green (r15 advisor finding).
  */
object Lineage {

  /** Session conf key selecting the cut mechanism (see class doc). */
  val ModeKey = "graft.plan.cuts"

  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeKey, "checkpoint") match {
      case "off"     => df
      case "persist" => df.persist(StorageLevel.MEMORY_AND_DISK)
      case _         => df.localCheckpoint(false)
    }

  /** Chain-friendly syntax: `relation.planCut` ≡ `Lineage.cut(relation)`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def planCut: DataFrame = cut(df)
  }
}
