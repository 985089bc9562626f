package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.LocalDateTime
import java.util.zip.ZipInputStream
import scala.jdk.CollectionConverters._
import scala.collection.mutable

/** Local staging lifecycle for acquired files (SURVEY.md §2.1 S10-S13,
  * §2.5 K11): land → check → (unzip) → process → archive-with-timestamp /
  * delete, plus redo from the history dir with filename de-timestamping
  * (`Wrap.pm:146-299, 634-670`). Driver-side by design — acquisition is a
  * manifest operation, not a DataFrame op; the DataFrame plan starts at the
  * staged paths this class hands out.
  */
class FileStaging(workDir: String, historyDir: String,
                  clock: () => LocalDateTime = () => LocalDateTime.now()) {

  private val work = Files.createDirectories(Paths.get(workDir))
  private val history = Files.createDirectories(Paths.get(historyDir))
  private val processed = mutable.Set[String]()
  private val toArchive = mutable.Set[String]()
  private val toRemove = mutable.Set[String]()

  private val stamp = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")

  /** `getLocalFiles` (`Wrap.pm:180-207`): copy a file or glob into the work
    * dir; returns landed names. */
  def getLocalFiles(sourceGlob: String): Seq[String] = {
    val p = Paths.get(sourceGlob)
    val (dir, pattern) = (Option(p.getParent).getOrElse(Paths.get(".")), p.getFileName.toString)
    val matcher = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$pattern")
    val found = Files.list(dir).iterator().asScala
      .filter(f => matcher.matches(f.getFileName)).toSeq.sortBy(_.toString)
    found.map { f =>
      val target = work.resolve(f.getFileName)
      Files.copy(f, target, StandardCopyOption.REPLACE_EXISTING)
      target.getFileName.toString
    }
  }

  /** `checkFiles` gate (`Wrap.pm:237-282`): classify expected files into
    * present/missing; present ones are registered for archive. */
  def checkFiles(expected: Seq[String], optional: Set[String] = Set.empty)
      : (Seq[String], Seq[String]) = {
    val (present, missing) = expected.partition(f => Files.exists(work.resolve(f)))
    present.foreach(toArchive += _)
    val hardMissing = missing.filterNot(optional)
    (present, hardMissing)
  }

  /** `extractArchives` (`Wrap.pm:285-299`): unzip; members join the input
    * list, the archive itself is tracked for removal. */
  def extractArchives(archiveName: String): Seq[String] = {
    val zis = new ZipInputStream(Files.newInputStream(work.resolve(archiveName)))
    val members = mutable.Buffer[String]()
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val out = work.resolve(e.getName)
        Option(out.getParent).foreach(Files.createDirectories(_))
        Files.copy(zis, out, StandardCopyOption.REPLACE_EXISTING)
        members += e.getName
      }
      e = zis.getNextEntry
    }
    zis.close()
    toArchive -= archiveName
    toRemove += archiveName
    members.toSeq
  }

  /** `redoFile` (`Wrap.pm:146-177`): pick files from the history dir,
    * stripping timestamp suffixes `name_YYYYMMDD_HHMMSS.ext` (and bare
    * 14-digit stamps) back to the canonical name; lands them in work. */
  def redoFiles(canonicalName: String): Seq[String] = {
    val (base, ext) = canonicalName.lastIndexOf('.') match {
      case -1 => (canonicalName, "")
      case i  => (canonicalName.substring(0, i), canonicalName.substring(i))
    }
    // anchored both ends (Wrap.pm anchors the whole filename): an
    // unanchored match would let canonical "a.csv" claim history files of
    // unrelated loads like "data_20240708_120000.csv" via the embedded
    // "a_20240708_120000.csv" suffix
    val re = ("^" + java.util.regex.Pattern.quote(base) +
      "(_\\d{8}_\\d{6}|_\\d{8}|\\d{14})?" + java.util.regex.Pattern.quote(ext) + "$").r
    val found = Files.list(history).iterator().asScala
      .filter(f => re.pattern.matcher(f.getFileName.toString).matches())
      .toSeq.sortBy(_.toString)
    found.map { f =>
      val target = work.resolve(canonicalName)
      Files.copy(f, target, StandardCopyOption.REPLACE_EXISTING)
      canonicalName
    }.distinct
  }

  /** `markProcessed` (`Wrap.pm:429-449`): only processed files are eligible
    * for archive/remove at process end. */
  def markProcessed(names: Seq[String]): Unit = processed ++= names

  /** Register a PRODUCED file (export path, `filesToArchive`,
    * `Wrap.pm:476`) for the archive move at [[finish]]. Acquired files
    * register themselves via [[checkFiles]]. */
  def registerForArchive(name: String): Unit = toArchive += name

  def path(name: String): String = work.resolve(name).toString

  /** Process-end bookkeeping (`processingEnd` + `moveFilesToHistory`,
    * `Wrap.pm:528-586, 634-670`): archive processed files into history with
    * a `name_YYYYMMDD_HHMMSS.ext` stamp; delete the ones marked for
    * removal. Returns archived names. */
  def finish(): Seq[String] = {
    val ts = clock().format(stamp)
    val archived = toArchive.toSeq.sorted.filter(processed).map { name =>
      val src = work.resolve(name)
      val (base, ext) = name.lastIndexOf('.') match {
        case -1 => (name, "")
        case i  => (name.substring(0, i), name.substring(i))
      }
      val dst = history.resolve(s"${base}_$ts$ext")
      Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.getFileName.toString
    }
    toRemove.toSeq.filter(processed).foreach(n => Files.deleteIfExists(work.resolve(n)))
    archived
  }

  /** `removeFilesOlderX` (`Wrap/FTP.pm:20-56`): age-based history cleanup
    * by modification time. */
  def cleanupHistory(olderThanDays: Int): Seq[String] = {
    val cutoff = System.currentTimeMillis() - olderThanDays * 86400000L
    val old = {
      val s = Files.list(history)
      try s.iterator().asScala
        .filter(f => Files.getLastModifiedTime(f).toMillis < cutoff).toSeq
      finally s.close()
    }
    old.map { f => Files.delete(f); f.getFileName.toString }
  }
}
