package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** Compound File Binary (OLE2) container parser — the envelope of legacy
  * `.xls` workbooks (S3). JDK-only (offline build, no POI in
  * `/opt/spark/jars`): header → DIFAT → FAT → directory → stream chains,
  * including the mini-FAT path for streams below the mini-stream cutoff.
  * Reference consumer: `Spreadsheet::ParseExcel` behind `readExcel`
  * (`Wrap/File.pm:309-321`); the format itself is MS-CFB (public spec).
  */
object CfbFile {

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  case class Entry(name: String, objectType: Int, startSector: Int, size: Long)

  final class Parsed(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 && (0 until 8).forall(i => bytes(i) == Magic(i)),
      "not a compound (OLE2) file")

    private val sectorSize = 1 << buf.getShort(30)
    private val miniSectorSize = 1 << buf.getShort(32)
    private val firstDirSector = buf.getInt(48)
    private val miniCutoff = buf.getInt(56)
    private val firstMiniFatSector = buf.getInt(60)
    private val numMiniFatSectors = buf.getInt(64)
    private val firstDifatSector = buf.getInt(68)
    private val numDifatSectors = buf.getInt(72)

    private def sector(n: Int): Array[Byte] = {
      val off = 512 + n * sectorSize
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + sectorSize, bytes.length))
    }
    private def ints(b: Array[Byte]): Array[Int] = {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      Array.fill(b.length / 4)(bb.getInt())
    }

    // DIFAT: 109 header entries + chained DIFAT sectors (127 entries + next)
    private val fatSectors: Seq[Int] = {
      val head = (0 until 109).map(i => buf.getInt(76 + i * 4))
      val chained = mutable.ArrayBuffer[Int]()
      var ds = firstDifatSector
      var guard = 0
      while (ds != EndOfChain && ds != FreeSect && guard <= numDifatSectors) {
        val vals = ints(sector(ds))
        chained ++= vals.dropRight(1)
        ds = vals.last
        guard += 1
      }
      (head ++ chained).filter(_ != FreeSect)
    }
    private val fat: Array[Int] = fatSectors.flatMap(s => ints(sector(s))).toArray

    // bounded by the FAT size: a malformed/cyclic chain terminates (and
    // yields a bounded garbage read that fails loudly downstream) instead
    // of iterating forever
    private def chain(start: Int): Iterator[Int] =
      Iterator.iterate(start)(s => fat(s))
        .takeWhile(s => s != EndOfChain && s != FreeSect)
        .take(math.max(fat.length, 1))

    private def readChain(start: Int): Array[Byte] =
      chain(start).flatMap(sector).toArray

    private val directory: Seq[Entry] = {
      val d = readChain(firstDirSector)
      val db = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
      (0 until d.length / 128).map { i =>
        val base = i * 128
        val nameLen = db.getShort(base + 64) & 0xFFFF
        val name = if (nameLen >= 2)
          new String(d, base, nameLen - 2, "UTF-16LE") else ""
        Entry(name, d(base + 66) & 0xFF, db.getInt(base + 116),
          db.getLong(base + 120) & 0xFFFFFFFFL)
      }
    }

    // mini stream: the root entry's regular chain, addressed in mini sectors
    private lazy val miniFat: Array[Int] =
      if (numMiniFatSectors == 0 || firstMiniFatSector == EndOfChain) Array.empty
      else chain(firstMiniFatSector).flatMap(s => ints(sector(s))).toArray
    private lazy val miniStream: Array[Byte] = readChain(directory.head.startSector)

    private def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      while (s != EndOfChain && s != FreeSect && out.size < size) {
        val off = s * miniSectorSize
        out.write(miniStream, off, math.min(miniSectorSize, miniStream.length - off))
        s = miniFat(s)
      }
      out.toByteArray
    }

    def entries: Seq[Entry] = directory.filter(_.objectType == 2)

    /** Stream content by directory-entry name, exact size. */
    def stream(name: String): Option[Array[Byte]] =
      directory.find(e => e.objectType == 2 && e.name == name).map { e =>
        val raw =
          if (e.size < miniCutoff) readMiniChain(e.startSector, e.size)
          else readChain(e.startSector)
        java.util.Arrays.copyOf(raw, e.size.toInt)
      }
  }

  def parse(bytes: Array[Byte]): Parsed = new Parsed(bytes)
}
