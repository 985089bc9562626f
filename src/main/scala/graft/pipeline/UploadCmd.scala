package graft.pipeline

import java.nio.file.{Files, Path}
import java.util.concurrent.TimeUnit
import scala.util.matching.Regex

/** K10 `executeUploadCMD` (`/root/reference/Wrap.pm:484-513`): hand the
  * produced files to an external upload program, then clean up and
  * scrape the program's log for errors. The reference `system`s the
  * command, classifies the three failure shapes (couldn't start / killed
  * by signal / nonzero exit), unlinks the produced files from the upload
  * directory, and treats the existence of the upload log as an error
  * report to surface. This re-expression adds the timeout bound the
  * reference lacks (a hung uploader must not hang the load) and makes
  * the log scrape pattern-driven.
  *
  * Driver-side by design: uploads hand off whole files produced by a
  * sink, not distributed data — the cluster-scale data path stays in the
  * table sinks; this is the last-mile delivery hook.
  */
object UploadCmd {

  /** Outcome of one upload attempt.
    *
    * @param exitCode      process exit value; -1 when it could not start
    *                      or was killed by the timeout
    * @param timedOut      the command exceeded `timeout` and was killed
    * @param startFailure  message when the process could not be launched
    *                      (the reference's `$? == -1` arm)
    * @param scrapedErrors matching lines from the upload log (whole
    *                      content when no patterns are given — the
    *                      reference surfaces the entire log)
    * @param removedFiles  produced files successfully cleaned up
    * @param failedRemovals produced files that could not be removed
    */
  final case class UploadResult(
      exitCode: Int,
      timedOut: Boolean,
      startFailure: Option[String],
      scrapedErrors: Seq[String],
      removedFiles: Seq[String],
      failedRemovals: Seq[String]) {
    def ok: Boolean =
      exitCode == 0 && !timedOut && startFailure.isEmpty && scrapedErrors.isEmpty
  }

  /** Run `cmd` (argv form — never a shell string, so filenames can't
    * inject), wait at most `timeout`, then remove the produced files
    * from `uploadDir` and scrape `logFile` for `errorPatterns`.
    * Cleanup and scrape run even when the command fails — exactly like
    * the reference, which unlinks and reads the log unconditionally. */
  def executeUploadCmd(cmd: Seq[String],
                       filesToWrite: Seq[String],
                       uploadDir: Path,
                       logFile: Option[Path] = None,
                       errorPatterns: Seq[Regex] = Nil,
                       timeoutMillis: Long = 10 * 60 * 1000L,
                       env: Map[String, String] = Map.empty): UploadResult = {
    require(cmd.nonEmpty, "upload command must not be empty")
    var exitCode = -1
    var timedOut = false
    var startFailure: Option[String] = None
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.directory(uploadDir.toFile)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.redirectErrorStream(true)
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      if (proc.waitFor(timeoutMillis, TimeUnit.MILLISECONDS)) {
        exitCode = proc.exitValue()
      } else {
        timedOut = true
        proc.destroyForcibly()
        proc.waitFor(10, TimeUnit.SECONDS)
      }
    } catch {
      case e: java.io.IOException => startFailure = Some(e.getMessage)
    }

    // remove produced files (Wrap.pm:502-505) — unconditional, so a
    // retry re-produces them instead of re-uploading stale copies. A
    // file the uploader already consumed (moved away) counts as removed:
    // the contract is "gone afterwards", not "we did the unlink".
    val (removed, failed) = filesToWrite.partition { f =>
      try { Files.deleteIfExists(uploadDir.resolve(f)); true }
      catch { case _: java.io.IOException => false }
    }

    // take error log from the uploader (Wrap.pm:507-513): existence of
    // content IS the error signal; patterns narrow it to matching lines
    val scraped: Seq[String] = logFile match {
      case Some(p) if Files.exists(p) =>
        val lines = scala.jdk.CollectionConverters
          .ListHasAsScala(Files.readAllLines(p)).asScala.toSeq
        if (errorPatterns.isEmpty) lines.filter(_.nonEmpty)
        else lines.filter(l => errorPatterns.exists(_.findFirstIn(l).isDefined))
      case _ => Nil
    }

    UploadResult(exitCode, timedOut, startFailure, scraped, removed, failed)
  }
}
