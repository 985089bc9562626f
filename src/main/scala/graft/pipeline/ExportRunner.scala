package graft.pipeline

import graft.pipeline.Config.LoadHooks
import graft.sinks.{TextSink, TextWriteFormat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Path, Paths}
import scala.util.matching.Regex

/** The export pipeline end-to-end (SURVEY.md §3.2 — `writeFileFromDB`,
  * `/root/reference/Wrap.pm:452-481`): query result → `postReadProcessing`
  * hook → delimited file with the write contract of [[TextSink]] →
  * optional delivery (SFTP temp-rename, K9, or an upload command, K10) →
  * archive registration for the staging lifecycle's [[FileStaging.finish]].
  *
  * Mirrors the reference's composition decisions:
  *  - column order defaults to the query's own column order when the
  *    format does not pin one (`Wrap.pm:461-462` takes columnnames from
  *    the statement handle);
  *  - an empty result is a WARNING, not an error (`Wrap.pm:463`) — the
  *    file is still written (header only) and still delivered;
  *  - delivery failure does not undo the local file; the error is
  *    reported and the file stays for a retry;
  *  - archive happens independently of upload (`Wrap.pm:475-476`) —
  *    except command delivery, whose contract REMOVES the produced files
  *    (`Wrap.pm:502-505`), leaving nothing to archive.
  */
object ExportRunner {

  sealed trait Delivery
  case object NoDelivery extends Delivery
  /** K9: monitor-safe SFTP upload via `temp.<name>` + remote rename. */
  final case class SftpDelivery(fs: RemoteFs, remoteDir: String,
      useTempFile: Boolean = true, deferRename: Boolean = false) extends Delivery
  /** K10: hand the file to an external upload program. */
  final case class CmdDelivery(cmd: Seq[String], logFile: Option[Path] = None,
      errorPatterns: Seq[Regex] = Nil,
      timeoutMillis: Long = 10 * 60 * 1000L) extends Delivery

  final case class Export(
      /** SQL over registered temp views (S6/W3 passthrough). */
      query: String,
      fileName: String,
      format: TextWriteFormat = TextWriteFormat(columns = Nil),
      hooks: LoadHooks = LoadHooks(),
      delivery: Delivery = NoDelivery)

  final case class ExportResult(rows: Long, file: String, delivered: Boolean,
                                errors: Seq[String])

  /** Run one export: the DataFrame plan (query + hook + line encoding)
    * executes distributed; only the single-file commit, delivery, and
    * archive bookkeeping are driver-side — the same split as the import
    * pipeline's [[LoadRunner]]. */
  def run(spark: SparkSession, export: Export,
          staging: FileStaging): ExportResult = {
    val df0 = spark.sql(export.query)
    val df: DataFrame = export.hooks.postRead(df0)
    val fmt =
      if (export.format.columns.nonEmpty) export.format
      else export.format.copy(columns = df.columns.toSeq)

    val local = staging.path(export.fileName)
    // the sink counts rows inside the line-encoding pass, so the reported
    // count IS the file's content even for a non-deterministic query —
    // and the plan executes once, not twice
    val rows = TextSink.write(df, fmt, local)
    val errors = Seq.newBuilder[String]
    if (rows == 0) errors += s"warn: no data retrieved for ${export.fileName}"

    val delivered = export.delivery match {
      case NoDelivery => false
      case SftpDelivery(fs, remoteDir, useTemp, defer) =>
        val ok = Sftp.uploadFile(fs, remoteDir, Paths.get(staging.path("")),
          export.fileName, useTempFile = useTemp, deferRename = defer)
        if (!ok) errors += s"error: SFTP upload of ${export.fileName} failed"
        ok
      case CmdDelivery(cmd, logFile, patterns, timeout) =>
        val r = UploadCmd.executeUploadCmd(cmd, Seq(export.fileName),
          Paths.get(staging.path("")), logFile, patterns, timeout)
        if (!r.ok) {
          errors += (r.startFailure.map(m => s"error: upload command failed to start: $m")
            .getOrElse(s"error: upload command exit=${r.exitCode}" +
              (if (r.timedOut) " (timeout)" else "")))
          errors ++= r.scrapedErrors.map(l => s"uploadlog: $l")
        }
        r.ok
    }

    // archive independently of upload (Wrap.pm:475-476) — unless command
    // delivery consumed the file (its cleanup contract)
    export.delivery match {
      case _: CmdDelivery => ()
      case _ =>
        staging.registerForArchive(export.fileName)
        staging.markProcessed(Seq(export.fileName))
    }
    ExportResult(rows, local, delivered, errors.result())
  }
}
