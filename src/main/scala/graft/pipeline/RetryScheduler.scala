package graft.pipeline

import java.time.LocalTime

/** Time-bounded retry scheduling (`retrySleepAbort`, `Wrap.pm:604-631`;
  * R2 in SURVEY.md §2.7): a load with `plannedUntil` (HHMM) re-runs on a
  * planned cadence, switching to the error cadence after a failure; runs
  * stop at the cutoff or when the next start would wrap past midnight.
  * First-run-success memory (R3, `Wrap.pm:264-271`) downgrades later
  * missing files to warnings.
  *
  * Pure decision logic with injected clock — the driver loop around it owns
  * the actual sleeping.
  */
object RetryScheduler {

  sealed trait Decision
  case class Sleep(seconds: Int, becauseOfError: Boolean) extends Decision
  case class Finish(reason: String) extends Decision

  case class State(
      firstRunSuccess: Boolean = false,
      retryBecauseOfError: Boolean = false,
      processEnd: Boolean = false)

  /** After a run: decide end-state and cadence (`processingEnd`,
    * `Wrap.pm:528-586`). */
  def afterRun(p: Config.ProcessConfig, state: State, hadErrors: Boolean): State = {
    if (!hadErrors) {
      State(
        firstRunSuccess = p.plannedUntil.nonEmpty, // R3 memory
        retryBecauseOfError = false,
        processEnd = p.plannedUntil.isEmpty)      // planned repetition continues
    } else {
      state.copy(retryBecauseOfError = !(p.plannedUntil.nonEmpty && state.firstRunSuccess),
        processEnd = false)
    }
  }

  /** Sleep-or-finish decision at `now` (`retrySleepAbort`). */
  def nextAction(p: Config.ProcessConfig, state: State, now: LocalTime): Decision = {
    if (state.processEnd) return Finish("process complete")
    val retrySeconds =
      if (state.retryBecauseOfError) p.retrySecondsErr else p.retrySecondsPlanned
    // reference arithmetic: HHMM + retrySeconds/60 minutes, carry into hours
    val hrs = now.getHour
    val min = now.getMinute
    val addMin = retrySeconds / 60
    val nextStartNum = (hrs + (min + addMin) / 60) * 100 + (min + addMin) % 60
    val currentNum = hrs * 100 + min
    val endNum = if (p.plannedUntil.nonEmpty) p.plannedUntil.toInt else 0
    if (currentNum >= endNum)
      Finish(f"current time $currentNum%04d >= endTime $endNum%04d")
    else if (nextStartNum >= 2400)
      Finish(f"next start $nextStartNum%04d wraps past midnight")
    else
      Sleep(retrySeconds, state.retryBecauseOfError)
  }
}
