package graft

import graft.pipeline.{LocalRemoteFs, RemoteFs, Sftp}
import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import org.scalatest.funsuite.AnyFunSuite

/** Pins the S9/K9 transfer protocol (`Wrap/FTP.pm:59-197`) against the
  * local-FS transport: glob mget, mtime preservation, optional-file
  * suppression, temp-upload with immediate and deferred remote rename. */
class SftpSpec extends AnyFunSuite {

  private def setup(): (Path, Path, LocalRemoteFs) = {
    val root = Files.createTempDirectory("graft-sftp-remote-")
    val local = Files.createTempDirectory("graft-sftp-local-")
    Files.createDirectories(root.resolve("in"))
    (root, local, new LocalRemoteFs(root))
  }

  test("glob fetch retrieves every match, names reported, mtimes preserved") {
    val (root, local, fs) = setup()
    val t = FileTime.fromMillis(1600000000000L)
    Seq("a_2024.csv", "b_2024.csv", "other.txt").foreach { n =>
      Files.write(root.resolve("in").resolve(n), n.getBytes)
      Files.setLastModifiedTime(root.resolve("in").resolve(n), t)
    }
    val r = Sftp.getFiles(fs, "in", local, "*_2024.csv")
    assert(r.ok && r.retrieved == Seq("a_2024.csv", "b_2024.csv"))
    assert(Files.exists(local.resolve("a_2024.csv")))
    assert(!Files.exists(local.resolve("other.txt")))
    assert(Files.getLastModifiedTime(local.resolve("a_2024.csv")) == t,
      "mtime must survive the transfer (the reference's utime)")
  }

  test("single fetch preserves mtime; dontDoUtime leaves the local clock") {
    val (root, local, fs) = setup()
    val t = FileTime.fromMillis(1500000000000L)
    Files.write(root.resolve("in").resolve("f.csv"), "x".getBytes)
    Files.setLastModifiedTime(root.resolve("in").resolve("f.csv"), t)
    val r = Sftp.getFiles(fs, "in", local, "f.csv")
    assert(r.ok && r.retrieved == Seq("f.csv"))
    assert(Files.getLastModifiedTime(local.resolve("f.csv")) == t)
    val r2 = Sftp.getFiles(fs, "in", local, "f.csv", dontDoUtime = true)
    assert(r2.ok)
    assert(Files.getLastModifiedTime(local.resolve("f.csv")) != t,
      "dontDoUtime must skip the utime copy")
  }

  test("missing file: error unless optional or firstRunSuccess-suppressed") {
    val (_, local, fs) = setup()
    assert(!Sftp.getFiles(fs, "in", local, "absent.csv").ok)
    val opt = Sftp.getFiles(fs, "in", local, "absent.csv", optional = true)
    assert(opt.ok && opt.retrieved.isEmpty,
      "optional file missing is success with nothing retrieved (FTP.pm:91-97)")
    val redo = Sftp.getFiles(fs, "in", local, "absent.csv",
      suppressGetError = true)
    assert(redo.ok && redo.retrieved.isEmpty)
  }

  test("temp upload: monitor sees temp.name until the remote rename flips it") {
    val (root, local, fs) = setup()
    Files.write(local.resolve("out.csv"), "data".getBytes)
    // transport that records the remote states a monitor could observe
    val observed = scala.collection.mutable.ArrayBuffer.empty[Set[String]]
    val recording = new RemoteFs {
      private def snap(): Unit = observed +=
        fs.listGlob("up", "*").toSet
      def listGlob(d: String, p: String) = fs.listGlob(d, p)
      def get(d: String, n: String, l: Path) = fs.get(d, n, l)
      def put(l: Path, d: String, n: String) = {
        val r = fs.put(l, d, n); snap(); r
      }
      def rename(d: String, f: String, t: String) = {
        val r = fs.rename(d, f, t); snap(); r
      }
      def mtime(d: String, n: String) = fs.mtime(d, n)
    }
    assert(Sftp.uploadFile(recording, "up", local, "out.csv"))
    // after put: only the temp name existed; after rename: only the final
    assert(observed.toSeq == Seq(Set("temp.out.csv"), Set("out.csv")),
      s"monitor must never see a half-delivered final file: $observed")
    // local file keeps its original name for further processing
    assert(Files.exists(local.resolve("out.csv")))
  }

  test("deferred rename: all files flip together via moveTempFiles") {
    val (root, local, fs) = setup()
    Seq("p1.csv", "p2.csv").foreach(n =>
      Files.write(local.resolve(n), n.getBytes))
    Seq("p1.csv", "p2.csv").foreach { n =>
      assert(Sftp.uploadFile(fs, "up", local, n, deferRename = true))
    }
    assert(fs.listGlob("up", "*").toSet == Set("temp.p1.csv", "temp.p2.csv"),
      "deferred uploads stay temp until the coordinated flip")
    Seq("p1.csv", "p2.csv").foreach { n =>
      assert(Sftp.moveTempFiles(fs, "up", n))
    }
    assert(fs.listGlob("up", "*").toSet == Set("p1.csv", "p2.csv"))
  }

  test("plain put when temp files are disabled; missing local file fails") {
    val (root, local, fs) = setup()
    Files.write(local.resolve("d.csv"), "x".getBytes)
    assert(Sftp.uploadFile(fs, "up", local, "d.csv", useTempFile = false))
    assert(fs.listGlob("up", "*") == Seq("d.csv"))
    assert(!Sftp.uploadFile(fs, "up", local, "ghost.csv"))
  }
}
