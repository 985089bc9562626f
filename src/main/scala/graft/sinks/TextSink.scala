package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.nio.charset.Charset
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Delimited / quoted-CSV / fixed-width text writer (SURVEY.md §2.5 K1,
  * reference `writeText` `Wrap/File.pm:493-611`).
  *
  * @param columns       ordered output columns (`columns` hash; W2
  *                      deterministic ordering)
  * @param sep           field separator
  * @param sepHead       alternate separator for the header line
  *                      (`format_sepHead`, `Wrap/File.pm:537`)
  * @param quoted        Text::CSV-style quoting (quotes only where needed)
  * @param padLen        fixed-width left-aligned pads (`sprintf("%-*s")`,
  *                      `Wrap/File.pm:538,592`)
  * @param beforeHeader  literal preamble before the header
  *                      (`format_beforeHeader`, `Wrap/File.pm:551`)
  * @param suppressHeader drop the header line (`Wrap/File.pm:552`)
  * @param encoding      output charset (driver-side transcode on rename)
  */
case class TextWriteFormat(
    columns: Seq[String],
    sep: String = "\t",
    sepHead: Option[String] = None,
    quoted: Boolean = false,
    padLen: Seq[Int] = Nil,
    beforeHeader: Option[String] = None,
    suppressHeader: Boolean = false,
    encoding: String = "UTF-8")

/** Single-file text export with the reference's file contract: the caller
  * gets ONE named file, produced atomically (write to temp, then rename —
  * the same monitor-safe idiom as the reference's FTP temp-upload,
  * `Wrap/FTP.pm:135-155`).
  *
  * The single-file shape is the point of this sink (the reference exports
  * report files); it deliberately `coalesce(1)`s. Large distributed outputs
  * should use the parquet/partitioned writers instead.
  */
object TextSink {

  private def lineExpr(fmt: TextWriteFormat): Column = {
    if (fmt.quoted) {
      import scala.jdk.CollectionConverters._
      to_csv(struct(fmt.columns.map(col): _*), Map("sep" -> fmt.sep).asJava)
    } else if (fmt.padLen.nonEmpty) {
      concat(fmt.columns.zip(fmt.padLen).map { case (c, w) =>
        rpad(coalesce(col(c).cast("string"), lit("")), w, " ")
      }: _*)
    } else {
      concat_ws(fmt.sep, fmt.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    }
  }

  private def headerLines(fmt: TextWriteFormat): Seq[String] = {
    val pre = fmt.beforeHeader.toSeq
    val head = if (fmt.suppressHeader) Nil else {
      val hsep = fmt.sepHead.getOrElse(fmt.sep)
      if (fmt.padLen.nonEmpty)
        Seq(fmt.columns.zip(fmt.padLen).map { case (c, w) => c.padTo(w, ' ') }.mkString)
      else Seq(fmt.columns.mkString(hsep))
    }
    pre ++ head
  }

  /** Write `df` (already ordered by the caller) to exactly `target`.
    * Returns the number of data rows written (header/preamble excluded),
    * counted inside the line-encoding pass itself — the rows in the file,
    * not a second execution of the plan (which could disagree for a
    * non-deterministic query and doubles the export cost). The count
    * rides a [[org.apache.spark.util.LongAccumulator]] through the
    * single final write task, so it reflects exactly what the committed
    * part file contains. */
  def write(df: DataFrame, fmt: TextWriteFormat, target: String): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val tmpDir = Files.createTempDirectory("graft-textsink-").toString
    val rowCount = spark.sparkContext.longAccumulator("graft.textsink.rows")
    val headerDf = spark.createDataset(headerLines(fmt)).toDF("value").coalesce(1)
    val body = df.select(lineExpr(fmt).as("value")).as[String]
      .mapPartitions { it => it.map { s => rowCount.add(1L); s } }
      .toDF("value").coalesce(1)
    // union preserves child partition order; final coalesce(1) concatenates
    headerDf.union(body).coalesce(1).write.mode("overwrite").text(tmpDir)

    val part = {
      val s = Files.list(Paths.get(tmpDir))
      try s.toArray.map(_.asInstanceOf[Path]) finally s.close()
    }.find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
    val targetPath = Paths.get(target)
    Option(targetPath.getParent).foreach(Files.createDirectories(_))
    if (fmt.encoding.equalsIgnoreCase("UTF-8")) {
      Files.move(part, targetPath, StandardCopyOption.REPLACE_EXISTING)
    } else {
      val content = new String(Files.readAllBytes(part), Charset.forName("UTF-8"))
      val tmpFile = targetPath.resolveSibling("temp." + targetPath.getFileName)
      Files.write(tmpFile, content.getBytes(Charset.forName(fmt.encoding)))
      Files.move(tmpFile, targetPath, StandardCopyOption.REPLACE_EXISTING)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmpDir))
    rowCount.value
  }
}
