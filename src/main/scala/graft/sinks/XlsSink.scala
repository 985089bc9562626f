package graft.sinks

import org.apache.spark.sql.DataFrame
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Minimal legacy `.xls` (BIFF8-in-CFB) workbook writer — the xls half of
  * K2 (`writeExcel`, `Wrap/File.pm:614-691` writes both formats via
  * Spreadsheet::WriteExcel) and the fixture source for S3 round-trip
  * tests. Same export contract as [[XlsxSink]]: one single-sheet workbook,
  * header row + data rows, written atomically; rows are collected to the
  * driver (small-report path, bulk data belongs in parquet).
  *
  * BIFF8 body: BOF/BOUNDSHEET/EOF globals, then a worksheet substream of
  * LABEL (inline strings) and NUMBER records — no SST needed when
  * writing. The OLE2 container is a single regular-FAT "Workbook" stream,
  * padded to the mini-stream cutoff so no mini-FAT is required.
  */
object XlsSink {

  private val numericRe = "-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?".r

  // ---- BIFF8 records ---------------------------------------------------

  private def rec(typ: Int, data: Array[Byte]): Array[Byte] = {
    // BIFF8 caps a record body at 8224 bytes; longer payloads would need a
    // CONTINUE record, and `toShort` would silently wrap past 32767 into a
    // corrupt workbook — fail loudly instead (mirrors write()'s row cap)
    require(data.length <= 8224,
      s"BIFF8 record body ${data.length} bytes exceeds the 8224-byte cap " +
        "(cell too long for the xls writer)")
    val out = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putShort(typ.toShort).putShort(data.length.toShort).put(data)
    out.array()
  }

  private def bof(dt: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0x0600.toShort).putShort(dt.toShort)
      .putShort(0x0DBB.toShort).putShort(0x07CC.toShort)
      .putInt(0).putInt(0x0006)
    rec(0x0809, b.array())
  }

  private def label(row0: Int, col0: Int, s: String): Array[Byte] = {
    val wide = s.exists(_ > 0xFF)
    val chars = if (wide) s.getBytes("UTF-16LE")
                else s.map(_.toByte).toArray
    val b = ByteBuffer.allocate(9 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row0.toShort).putShort(col0.toShort).putShort(15)
      .putShort(s.length.toShort).put((if (wide) 1 else 0).toByte).put(chars)
    rec(0x0204, b.array())
  }

  private def number(row0: Int, col0: Int, v: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(row0.toShort).putShort(col0.toShort).putShort(15).putDouble(v)
    rec(0x0203, b.array())
  }

  private def dimension(rows: Int, cols: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0).putInt(rows).putShort(0).putShort(cols.toShort).putShort(0)
    rec(0x0200, b.array())
  }

  private def boundsheet(offset: Int, name: String): Array[Byte] = {
    val chars = name.map(_.toByte).toArray // sheet names kept ASCII here
    val b = ByteBuffer.allocate(8 + chars.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(offset).putShort(0).put(chars.length.toByte).put(0.toByte).put(chars)
    rec(0x0085, b.array())
  }

  private val eof: Array[Byte] = rec(0x000A, Array.empty)

  /** Assemble the Workbook stream: globals (with the BOUNDSHEET offset
    * back-patched) + one worksheet substream. */
  private def workbookStream(sheetName: String, header: Seq[String],
                             rows: Seq[Seq[Any]]): Array[Byte] = {
    val sheet = new ByteArrayOutputStream()
    sheet.write(bof(0x0010))
    sheet.write(dimension(rows.length + 1, header.length))
    def cell(row0: Int, col0: Int, v: Any): Array[Byte] = v match {
      case null                 => Array.empty[Byte]
      case n: java.lang.Number  => number(row0, col0, n.doubleValue())
      case s: String if numericRe.matches(s) => number(row0, col0, s.toDouble)
      case other                => label(row0, col0, other.toString)
    }
    header.zipWithIndex.foreach { case (h, c) => sheet.write(cell(0, c, h)) }
    rows.zipWithIndex.foreach { case (r, i) =>
      r.zipWithIndex.foreach { case (v, c) => sheet.write(cell(i + 1, c, v)) }
    }
    sheet.write(eof)

    // globals size is fixed once the sheet name is known → compute the
    // sheet-substream offset, then emit
    val globalsSize = bof(0x0005).length + boundsheet(0, sheetName).length + eof.length
    val out = new ByteArrayOutputStream()
    out.write(bof(0x0005))
    out.write(boundsheet(globalsSize, sheetName))
    out.write(eof)
    out.write(sheet.toByteArray)
    out.toByteArray
  }

  // ---- OLE2 container --------------------------------------------------

  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD
  private val FreeSect = 0xFFFFFFFF

  /** Wrap one stream into a minimal v3 compound file: FAT sectors +
    * 1 directory sector + data sectors; the stream is padded to the
    * 4096-byte mini-stream cutoff so no mini-FAT is needed. */
  private[graft] def cfbWrap(data0: Array[Byte],
                             streamName: String = "Workbook"): Array[Byte] = {
    val data = if (data0.length < 4096) java.util.Arrays.copyOf(data0, 4096)
               else data0
    val dataSectors = (data.length + 511) / 512
    var fatSectors = 1
    while (fatSectors + 1 + dataSectors > fatSectors * 128) fatSectors += 1
    require(fatSectors <= 109, s"stream too large for single-DIFAT writer")
    val totalSectors = fatSectors + 1 + dataSectors
    val dirSector = fatSectors
    val firstDataSector = fatSectors + 1

    val out = ByteBuffer.allocate(512 + totalSectors * 512)
      .order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.position(24)
    out.putShort(0x003E.toShort).putShort(3).putShort(0xFFFE.toShort)
      .putShort(9).putShort(6)
    out.position(44)
    out.putInt(fatSectors).putInt(dirSector).putInt(0).putInt(4096)
      .putInt(EndOfChain).putInt(0).putInt(EndOfChain).putInt(0)
    (0 until 109).foreach { i =>
      out.putInt(if (i < fatSectors) i else FreeSect)
    }
    // FAT
    val fatEntries = fatSectors * 128
    (0 until fatEntries).foreach { s =>
      val v =
        if (s < fatSectors) FatSect
        else if (s == dirSector) EndOfChain
        else if (s >= firstDataSector && s < firstDataSector + dataSectors)
          if (s == firstDataSector + dataSectors - 1) EndOfChain else s + 1
        else FreeSect
      out.putInt(v)
    }
    // directory sector: Root + stream + 2 free
    val dirBase = 512 + dirSector * 512
    def dirEntry(idx: Int, name: String, objType: Int, child: Int,
                 start: Int, size: Long): Unit = {
      val base = dirBase + idx * 128
      val nameBytes = name.getBytes("UTF-16LE")
      out.position(base)
      out.put(nameBytes, 0, math.min(nameBytes.length, 62))
      out.position(base + 64)
      out.putShort((nameBytes.length + 2).toShort)
      out.put(objType.toByte).put(1.toByte)
      out.putInt(-1).putInt(-1).putInt(child)
      out.position(base + 116)
      out.putInt(start).putInt(size.toInt).putInt(0)
    }
    dirEntry(0, "Root Entry", 5, child = 1, start = EndOfChain, size = 0)
    dirEntry(1, streamName, 2, child = -1, start = firstDataSector,
      size = data.length.toLong)
    // data sectors
    out.position(512 + firstDataSector * 512)
    out.put(data)
    out.array()
  }

  /** Write `df` (caller-ordered) as a single-sheet xls workbook at
    * `target`, atomically. */
  def write(df: DataFrame, columns: Seq[String], target: String,
            sheetName: String = "Sheet1"): Unit = {
    val rows = df.select(columns.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).toSeq
    require(rows.length + 1 <= 65536, "BIFF8 sheet row limit (65536) exceeded")
    val bytes = cfbWrap(workbookStream(sheetName, columns, rows))
    val targetPath = Paths.get(target)
    Option(targetPath.getParent).foreach(Files.createDirectories(_))
    val tmp = targetPath.resolveSibling("temp." + targetPath.getFileName)
    Files.write(tmp, bytes)
    Files.move(tmp, targetPath, StandardCopyOption.REPLACE_EXISTING)
  }
}
