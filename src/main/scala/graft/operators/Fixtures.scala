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

  private val shared =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** BUILD-ONCE shared gate fixture: `build` runs at most once per
    * `key` per JVM (first caller builds under the key's map lock —
    * Verify's worker pool and Bench's repeated executions contend);
    * every later caller gets the same directory. The directory is
    * READ-ONLY by convention: a gate that mutates store state must
    * take a [[cloneDir]] copy first. This is what keeps the harness
    * prepare bill sub-linear in gate count — the composed store gates
    * used to each rebuild an identical corpus-scale base store from
    * scratch, twice per bench run (r14 query_prepare: 605 s total,
    * 20-60 s per top gate). Gate CONTENT is unchanged: the build
    * closure is the same code the gates ran inline, so every oracle
    * replays the same closed form. */
  def sharedDir(key: String)(build: Path => Unit): String =
    shared.computeIfAbsent(key, { _ =>
      val p = tempDir(
        s"graft-shared-${key.replaceAll("[^A-Za-z0-9_.-]", "_")}-")
      build(p)
      p.toString
    })

  /** Recursive copy of a shared fixture into a fresh gate-private
    * temp dir, for gates that mutate store state — a file copy is an
    * order of magnitude cheaper than re-deriving the store (no
    * shingling, no corpus shuffles). */
  def cloneDir(src: String, prefix: String): String = {
    val dst = tempDir(prefix).resolve("s")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(src), dst.toFile)
    dst.toString
  }
}
