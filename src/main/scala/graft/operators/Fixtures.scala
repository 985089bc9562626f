package graft.operators

import java.nio.file.{Files, Path}

/** Temp-directory allocation for gate fixtures (the source/sink
  * roundtrips and streaming/JDBC gates stage files the reference would
  * receive as incoming drops). Every directory is registered for
  * recursive removal at JVM exit: gate results are consumed lazily from
  * staged files, so the fixture must outlive the caller's read — but a
  * bench loop invokes each gate several times per process, and
  * unreclaimed table-sized fixtures would accumulate across rounds. */
private[graft] object Fixtures {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  private lazy val hookInstalled: Unit = {
    sys.addShutdownHook {
      // deleteQuietly swallows everything per directory, so one
      // unreadable/vanished fixture can't abort cleanup of the rest
      dirs.forEach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    }
    ()
  }

  /** A fresh temp directory cleaned up at JVM exit. */
  def tempDir(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }
}
