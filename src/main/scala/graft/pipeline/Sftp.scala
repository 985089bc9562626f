package graft.pipeline

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

/** S9/K9 remote file transfer (`/root/reference/Wrap/FTP.pm:59-197`),
  * split into the PROTOCOL (this object — glob-mget, mtime preservation,
  * optional-file suppression, monitor-safe temp-upload with immediate or
  * deferred rename) and the TRANSPORT ([[RemoteFs]] — the five verbs the
  * protocol needs). No network exists in this container, so the shipped
  * transport is [[LocalRemoteFs]], a filesystem fake that pins the
  * protocol contract; a deployment drops in an SSH/SFTP-backed
  * implementation of the same five verbs without touching the protocol.
  *
  * Acquisition and delivery are driver-side file staging by design —
  * the distributed data path starts after landed files hit
  * `spark.read` (see [[FileStaging]]) and ends when a sink has produced
  * the files to deliver.
  */
trait RemoteFs {
  /** List remote names matching a glob pattern (`*` wildcards), names
    * only — the reference's `$ftp->glob(..., names_only => 1)`. */
  def listGlob(dir: String, pattern: String): Seq[String]
  /** Download `dir/name` to `local`; false on failure. */
  def get(dir: String, name: String, local: Path): Boolean
  /** Upload `local` to `dir/name`; false on failure. */
  def put(local: Path, dir: String, name: String): Boolean
  /** Remote rename within `dir`; false on failure. */
  def rename(dir: String, from: String, to: String): Boolean
  /** Remote modification time, if statable. */
  def mtime(dir: String, name: String): Option[FileTime]
}

object Sftp {

  /** Result of a fetch: which remote names landed locally, and whether
    * the fetch counts as successful (optional-file and first-run-success
    * suppression can make an empty fetch OK —
    * `Wrap/FTP.pm:91-97`). */
  final case class GetResult(retrieved: Seq[String], ok: Boolean)

  /** Fetch one file or a glob (`*` ⇒ mget) from `remoteDir` into
    * `localDir`. Single-file fetches preserve the remote mtime on the
    * local copy (the reference's `utime`, `FTP.pm:102-104`) unless
    * `dontDoUtime`; a missing file is suppressed (ok=true, nothing
    * retrieved) when the file is `optional` or `suppressGetError` (the
    * reference's firstRunSuccess redo) is set. */
  def getFiles(fs: RemoteFs, remoteDir: String, localDir: Path,
               fileToRetrieve: String, optional: Boolean = false,
               suppressGetError: Boolean = false,
               dontDoUtime: Boolean = false): GetResult = {
    Files.createDirectories(localDir)
    if (fileToRetrieve.contains("*")) {
      val names = fs.listGlob(remoteDir, fileToRetrieve)
      val got = names.filter(n => fs.get(remoteDir, n, localDir.resolve(n)))
      if (!dontDoUtime)
        got.foreach { n =>
          fs.mtime(remoteDir, n).foreach(t =>
            Files.setLastModifiedTime(localDir.resolve(n), t))
        }
      // mget: per-file failures fail the fetch unless suppressed
      GetResult(got, got.size == names.size || suppressGetError)
    } else {
      val local = localDir.resolve(fileToRetrieve)
      val t = fs.mtime(remoteDir, fileToRetrieve)
      if (fs.get(remoteDir, fileToRetrieve, local)) {
        if (!dontDoUtime) t.foreach(Files.setLastModifiedTime(local, _))
        GetResult(Seq(fileToRetrieve), ok = true)
      } else GetResult(Nil, ok = optional || suppressGetError)
    }
  }

  /** Monitor-safe upload (`FTP.pm:118-165`): the file travels as
    * `temp.<name>` and reaches its final name only by REMOTE RENAME, so
    * a monitor watching `remoteDir` never sees a half-written final
    * file. With `deferRename` the rename is left to a later
    * [[moveTempFiles]] (the reference's `dontMoveTempImmediately` — all
    * files of a load flip together); with `useTempFile=false` the upload
    * is a plain put. The local file keeps its original name afterwards
    * (the reference renames temp back for further processing). */
  def uploadFile(fs: RemoteFs, remoteDir: String, localDir: Path,
                 fileToWrite: String, useTempFile: Boolean = true,
                 deferRename: Boolean = false): Boolean = {
    val local = localDir.resolve(fileToWrite)
    if (!Files.exists(local)) false
    else if (!useTempFile) fs.put(local, remoteDir, fileToWrite)
    else {
      val tmp = s"temp.$fileToWrite"
      if (!fs.put(local, remoteDir, tmp)) false
      else if (deferRename) true
      else fs.rename(remoteDir, tmp, fileToWrite)
    }
  }

  /** Deferred final rename of a [[uploadFile]] temp (`FTP.pm:170-197`):
    * flip `temp.<name>` → `<name>` remotely. */
  def moveTempFiles(fs: RemoteFs, remoteDir: String,
                    fileToWrite: String): Boolean =
    fs.rename(remoteDir, s"temp.$fileToWrite", fileToWrite)
}

/** Local-filesystem transport: `dir` arguments resolve under `root`.
  * Used by the spec to pin the protocol; doubles as a real transport for
  * mounted landing zones (NFS/FUSE), where the same temp-rename contract
  * holds. */
final class LocalRemoteFs(root: Path) extends RemoteFs {
  private def p(dir: String, name: String): Path =
    root.resolve(dir).resolve(name)

  def listGlob(dir: String, pattern: String): Seq[String] = {
    val d = root.resolve(dir)
    if (!Files.isDirectory(d)) Nil
    else {
      val m = d.getFileSystem.getPathMatcher("glob:" + pattern)
      val s = Files.list(d)
      try s.toArray.map(_.asInstanceOf[Path].getFileName)
        .filter(m.matches).map(_.toString).sorted.toSeq
      finally s.close()
    }
  }

  def get(dir: String, name: String, local: Path): Boolean =
    Files.exists(p(dir, name)) && {
      Files.copy(p(dir, name), local, StandardCopyOption.REPLACE_EXISTING)
      true
    }

  def put(local: Path, dir: String, name: String): Boolean =
    Files.exists(local) && {
      Files.createDirectories(root.resolve(dir))
      Files.copy(local, p(dir, name), StandardCopyOption.REPLACE_EXISTING)
      true
    }

  def rename(dir: String, from: String, to: String): Boolean =
    Files.exists(p(dir, from)) && {
      Files.move(p(dir, from), p(dir, to),
        StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      true
    }

  def mtime(dir: String, name: String): Option[FileTime] =
    if (Files.exists(p(dir, name))) Some(Files.getLastModifiedTime(p(dir, name)))
    else None
}
