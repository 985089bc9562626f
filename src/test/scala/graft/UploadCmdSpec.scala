package graft

import graft.pipeline.UploadCmd
import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions
import org.scalatest.funsuite.AnyFunSuite

/** K10 executeUploadCMD against fixture shell scripts: success path,
  * nonzero exit, log scrape, timeout kill, unlaunchable command, and the
  * unconditional produced-file cleanup (`Wrap.pm:484-513`). */
class UploadCmdSpec extends AnyFunSuite {

  private def tempDir(): Path = Files.createTempDirectory("graft-upload-")

  private def script(dir: Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, s"#!/bin/sh\n$body\n".getBytes("UTF-8"))
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p
  }

  test("successful upload removes produced files and reports ok") {
    val dir = tempDir()
    Files.write(dir.resolve("out1.csv"), "a,b\n".getBytes)
    Files.write(dir.resolve("out2.csv"), "c,d\n".getBytes)
    val up = script(dir, "up.sh", "cat out1.csv out2.csv > uploaded.txt")
    val r = UploadCmd.executeUploadCmd(Seq(up.toString),
      Seq("out1.csv", "out2.csv"), dir)
    assert(r.ok, s"expected ok, got $r")
    assert(r.exitCode == 0 && !r.timedOut)
    assert(Files.exists(dir.resolve("uploaded.txt")), "command really ran")
    assert(!Files.exists(dir.resolve("out1.csv")) &&
      !Files.exists(dir.resolve("out2.csv")), "produced files cleaned up")
    assert(r.removedFiles == Seq("out1.csv", "out2.csv"))
  }

  test("nonzero exit is reported and cleanup still runs") {
    val dir = tempDir()
    Files.write(dir.resolve("out.csv"), "x\n".getBytes)
    val up = script(dir, "up.sh", "exit 3")
    val r = UploadCmd.executeUploadCmd(Seq(up.toString), Seq("out.csv"), dir)
    assert(!r.ok && r.exitCode == 3)
    assert(!Files.exists(dir.resolve("out.csv")),
      "cleanup is unconditional, like the reference's unlink loop")
  }

  test("error log is scraped: whole content without patterns, lines with") {
    val dir = tempDir()
    val log = dir.resolve("upload.log")
    val up = script(dir, "up.sh",
      """printf 'transferred 2 files\nERROR: host unreachable\nretrying\n' > upload.log""")
    // no patterns: whole (non-empty) content surfaces, reference-style
    val all = UploadCmd.executeUploadCmd(Seq(up.toString), Nil, dir,
      logFile = Some(log))
    assert(all.scrapedErrors.size == 3 && !all.ok)
    // with patterns: only matching lines
    val r = UploadCmd.executeUploadCmd(Seq(up.toString), Nil, dir,
      logFile = Some(log), errorPatterns = Seq("(?i)error".r, "fail".r))
    assert(r.scrapedErrors == Seq("ERROR: host unreachable"))
    assert(!r.ok, "scraped errors fail the attempt even with exit 0")
    // absent log: clean
    Files.delete(log)
    val clean = UploadCmd.executeUploadCmd(Seq(script(dir, "ok.sh", "true").toString),
      Nil, dir, logFile = Some(log))
    assert(clean.ok && clean.scrapedErrors.isEmpty)
  }

  test("a hung uploader is killed at the timeout; files still cleaned up") {
    val dir = tempDir()
    Files.write(dir.resolve("out.csv"), "x\n".getBytes)
    val up = script(dir, "hang.sh", "sleep 60")
    val t0 = System.nanoTime()
    val r = UploadCmd.executeUploadCmd(Seq(up.toString), Seq("out.csv"), dir,
      timeoutMillis = 500)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(r.timedOut && !r.ok && r.exitCode == -1)
    assert(elapsed < 30, s"timeout must bound the wait, took $elapsed s")
    assert(!Files.exists(dir.resolve("out.csv")))
  }

  test("unlaunchable command reports a start failure (the $?==-1 arm)") {
    val dir = tempDir()
    val r = UploadCmd.executeUploadCmd(Seq(dir.resolve("no-such-cmd").toString),
      Nil, dir)
    assert(r.startFailure.isDefined && !r.ok && r.exitCode == -1)
  }

  test("already-consumed file counts as removed; unremovable is reported, not thrown") {
    val dir = tempDir()
    val up = script(dir, "up.sh", "true")
    // "gone.csv" was moved away by the uploader itself: end state (gone)
    // is what the cleanup contract wants, so it counts as removed.
    // "stuck.csv" is a non-empty directory: deleteIfExists throws
    // DirectoryNotEmptyException -> failedRemovals, no exception escapes.
    Files.createDirectories(dir.resolve("stuck.csv"))
    Files.writeString(dir.resolve("stuck.csv").resolve("inner"), "x")
    val r = UploadCmd.executeUploadCmd(Seq(up.toString),
      Seq("gone.csv", "stuck.csv"), dir)
    assert(r.removedFiles == Seq("gone.csv"))
    assert(r.failedRemovals == Seq("stuck.csv"))
  }
}
