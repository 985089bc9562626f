package graft

import graft.pipeline.{ExportRunner, FileStaging, LocalRemoteFs}
import graft.pipeline.ExportRunner._
import graft.sinks.TextWriteFormat
import java.nio.file.{Files, Paths}

/** The §3.2 export pipeline end-to-end (`writeFileFromDB`,
  * `Wrap.pm:452-481`): query → file → delivery → archive, composed. */
class ExportRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def staging(): (FileStaging, String, String) = {
    val root = Files.createTempDirectory("graft-export-").toString
    (new FileStaging(s"$root/work", s"$root/hist"), s"$root/work", s"$root/hist")
  }

  test("query -> file -> SFTP temp-rename delivery -> archive on finish") {
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .createOrReplaceTempView("exp_src")
    val (st, _, hist) = staging()
    val remoteRoot = Files.createTempDirectory("graft-remote-")
    Files.createDirectories(remoteRoot.resolve("drop"))
    val r = ExportRunner.run(spark,
      Export("SELECT id, v FROM exp_src ORDER BY id", "out.csv",
        TextWriteFormat(columns = Nil, sep = ","),
        delivery = SftpDelivery(new LocalRemoteFs(remoteRoot), "drop")),
      st)
    assert(r.rows == 3 && r.delivered && r.errors.isEmpty)
    // delivered under its FINAL name (temp-rename completed), same bytes
    val remote = remoteRoot.resolve("drop").resolve("out.csv")
    assert(Files.exists(remote), "final remote name present")
    assert(!Files.exists(remoteRoot.resolve("drop").resolve("temp.out.csv")))
    assert(Files.readString(remote) == Files.readString(Paths.get(r.file)))
    // archive rides the staging lifecycle: finish() stamps into history
    val archived = st.finish()
    assert(archived.exists(_.startsWith("out_")), s"archived: $archived")
    val histFiles = {
      val s = Files.list(Paths.get(hist))
      try s.count() finally s.close()
    }
    assert(histFiles == 1)
  }

  test("columns default to the query's order; empty result is a warning") {
    Seq.empty[(Int, String)].toDF("id", "v").createOrReplaceTempView("exp_empty")
    val (st, _, _) = staging()
    val r = ExportRunner.run(spark,
      Export("SELECT id, v FROM exp_empty", "empty.csv",
        TextWriteFormat(columns = Nil, sep = ",")), st)
    assert(r.rows == 0 && !r.delivered)
    assert(r.errors.exists(_.startsWith("warn: no data")))
    // header still written, in query column order
    assert(Files.readString(Paths.get(r.file)).trim == "id,v")
  }

  test("command delivery consumes the file; its errors surface") {
    Seq((7, "x")).toDF("id", "v").createOrReplaceTempView("exp_cmd")
    val (st, work, _) = staging()
    // uploader: records it ran, then removes nothing itself (ExportRunner's
    // UploadCmd contract cleans the produced file unconditionally)
    val script = Paths.get(work).resolve("up.sh")
    Files.writeString(script, "#!/bin/sh\ncp cmd.csv cmd.csv.sent\n")
    script.toFile.setExecutable(true)
    val r = ExportRunner.run(spark,
      Export("SELECT id, v FROM exp_cmd", "cmd.csv",
        TextWriteFormat(columns = Nil, sep = ","),
        delivery = CmdDelivery(Seq(script.toString))), st)
    assert(r.rows == 1 && r.delivered && r.errors.isEmpty)
    assert(Files.exists(Paths.get(work).resolve("cmd.csv.sent")), "uploader ran")
    assert(!Files.exists(Paths.get(work).resolve("cmd.csv")),
      "produced file consumed by the upload contract")
    // nothing registered for archive: the file is gone by design
    assert(st.finish().isEmpty)
  }
}
