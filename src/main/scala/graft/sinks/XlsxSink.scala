package graft.sinks

import org.apache.spark.sql.DataFrame
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal xlsx workbook writer (SURVEY.md §2.5 K2, reference `writeExcel`
  * `Wrap/File.pm:614-691`): header row + data rows on one sheet. JDK-only
  * (java.util.zip + handwritten OOXML), inline strings (no shared-strings
  * table), numbers written as numeric cells.
  *
  * Export contract matches the reference: ONE workbook file produced
  * atomically (temp + rename). Rows are collected to the driver — this is
  * the small-report export path, not a bulk sink; bulk data belongs in
  * parquet.
  */
object XlsxSink {

  private def colRef(row: Int, col: Int): String = {
    var c = col; val sb = new StringBuilder
    while (c > 0) { sb.insert(0, ('A' + (c - 1) % 26).toChar); c = (c - 1) / 26 }
    sb.append(row.toString).toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private def workbookXml(sheetName: String) =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
       |</workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  private val numericRe = "-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?".r

  /** Write `df` (caller-ordered) as a single-sheet workbook at `target`. */
  def write(df: DataFrame, columns: Seq[String], target: String,
            sheetName: String = "Sheet1"): Unit = {
    val rows = df.select(columns.map(org.apache.spark.sql.functions.col): _*)
      .collect()

    val sheet = new StringBuilder
    sheet.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n")
    sheet.append("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">\n<sheetData>\n")
    def appendRow(rowNo: Int, values: Seq[Any]): Unit = {
      sheet.append(s"""<row r="$rowNo">""")
      values.zipWithIndex.foreach { case (v, i) =>
        val ref = colRef(rowNo, i + 1)
        v match {
          case null => // omit empty cells
          case n: java.lang.Number =>
            sheet.append(s"""<c r="$ref"><v>$n</v></c>""")
          case s: String if numericRe.matches(s) =>
            sheet.append(s"""<c r="$ref"><v>$s</v></c>""")
          case other =>
            sheet.append(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>""")
        }
      }
      sheet.append("</row>\n")
    }
    appendRow(1, columns)
    rows.zipWithIndex.foreach { case (r, i) => appendRow(i + 2, r.toSeq) }
    sheet.append("</sheetData>\n</worksheet>")

    val targetPath = Paths.get(target)
    Option(targetPath.getParent).foreach(Files.createDirectories(_))
    val tmp = targetPath.resolveSibling("temp." + targetPath.getFileName)
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(tmp.toFile)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml", contentTypes)
    entry("_rels/.rels", rootRels)
    entry("xl/workbook.xml", workbookXml(sheetName))
    entry("xl/_rels/workbook.xml.rels", workbookRels)
    entry("xl/worksheets/sheet1.xml", sheet.toString)
    zos.close()
    Files.move(tmp, targetPath, StandardCopyOption.REPLACE_EXISTING)
  }
}
