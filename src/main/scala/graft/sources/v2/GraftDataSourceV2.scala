package graft.sources.v2

import graft.functions.Coerce
import graft.sources.{ExcelRows, TextFormat, XlsSource, XlsxFormat, XlsxSource, XmlFormat, XmlSource}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, LessThan, LessThanOrEqual, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 registration for the engine's custom file formats
  * (SURVEY.md §2.1 S1-S5 as *table providers*):
  *
  * {{{
  * spark.read.format("graft-xlsx").option("header", "a,b")
  *   .option("worksheetId", "1").load(path)
  * spark.read.format("graft-xls")  ... // BIFF8
  * spark.read.format("graft-xml").option("xpathRecordLevel", "//r")
  *   .option("xpath.a", "key").load(path)
  * spark.read.format("graft-fixed").option("poslen", "0-3,3-7").load(path)
  * }}}
  *
  * Why DSv2 rather than the object API alone: Catalyst's column pruning
  * reaches the scan ([[GraftScanBuilder]] implements
  * `SupportsPushDownRequiredColumns`), so a 2-column projection over a
  * 40-column workbook only pays per-cell conversion for 2 columns, an XML
  * query only evaluates the XPaths it selects, and a fixed-width scan only
  * substrings requested spans. The classic `binaryFile`+`mapPartitions`
  * path parses every declared column regardless of the query.
  *
  * Scale shape: one [[InputPartition]] per file (these container formats
  * are not splittable — parallelism is across files, the reference's
  * many-medium-files model, `Wrap/File.pm:154-187`). Readers stream bytes
  * through Hadoop `FileSystem`, so any cluster filesystem works; executors
  * resolve the filesystem from their own Hadoop site config.
  *
  * All four schemas are `(_file string, _lineno long, <declared>string…)`
  * — identical to the classic paths; coercion stays a downstream concern
  * ([[graft.pipeline.SchemaCoercion]]).
  */
object GraftDataSourceV2 {

  /** Option map with case-insensitive simple keys but case-PRESERVING
    * prefixed keys (`xpath.<col>`, `ns.<prefix>` name columns/prefixes). */
  final case class Opts(lower: Map[String, String], exact: Map[String, String]) {
    def get(k: String): Option[String] = lower.get(k.toLowerCase)
    def apply(k: String): String = get(k).getOrElse(
      throw new IllegalArgumentException(s"missing required option '$k'"))
    def getOrElse(k: String, d: String): String = get(k).getOrElse(d)
    def prefixed(prefix: String): Map[String, String] = exact.collect {
      case (k, v) if k.length > prefix.length &&
        k.substring(0, prefix.length).equalsIgnoreCase(prefix) =>
        k.substring(prefix.length) -> v
    }
  }

  def opts(m: util.Map[String, String]): Opts = {
    val exact = m.asScala.toMap
    Opts(exact.map { case (k, v) => k.toLowerCase -> v }, exact)
  }

  def csvList(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  def intList(s: String): Seq[Int] = csvList(s).map(_.toInt)
  def poslenList(s: String): Seq[(Int, Int)] = csvList(s).map { p =>
    p.split("-").map(_.trim) match {
      case Array(a, b) => (a.toInt, b.toInt)
      case _ => throw new IllegalArgumentException(s"bad poslen entry '$p'")
    }
  }

  def excelFormat(o: Opts): XlsxFormat = XlsxFormat(
    header = csvList(o("header")),
    targetHeader = o.get("targetHeader").map(csvList).getOrElse(Nil),
    worksheet = o.get("worksheet"),
    worksheetId = o.get("worksheetId").map(_.toInt),
    skip = o.getOrElse("skip", "0").toInt,
    headerColumns = o.get("headerColumns").map(intList).getOrElse(Nil),
    dateColumns = o.get("dateColumns").map(intList).getOrElse(Nil),
    stopOnEmptyValueColumn = o.get("stopOnEmptyValueColumn").map(_.toInt),
    thousandSep = o.getOrElse("thousandSep", ","),
    decimalSep = o.getOrElse("decimalSep", "."),
    normalizeNumerics = o.getOrElse("normalizeNumerics", "true").toBoolean)

  def xmlFormat(o: Opts): XmlFormat = XmlFormat(
    header = o.get("header").map(csvList)
      .getOrElse(o.prefixed("xpath.").keys.toSeq.sorted),
    xpathRecordLevel = o("xpathRecordLevel"),
    fieldXpath = o.prefixed("xpath."),
    namespaces = o.prefixed("ns."),
    thousandSep = o.getOrElse("thousandSep", ","),
    decimalSep = o.getOrElse("decimalSep", "."),
    normalizeNumerics = o.getOrElse("normalizeNumerics", "true").toBoolean)

  def fixedFormat(o: Opts): TextFormat = TextFormat(
    header = csvList(o("header")),
    targetHeader = o.get("targetHeader").map(csvList).getOrElse(Nil),
    poslen = poslenList(o("poslen")),
    skip = o.getOrElse("skip", "0").toInt,
    skipUntil = o.get("skipUntil"),
    eol = o.getOrElse("eol", "\r?\n"),
    encoding = o.getOrElse("encoding", "UTF-8"),
    allowLinefeedInData = o.getOrElse("allowLinefeedInData", "false").toBoolean,
    thousandSep = o.getOrElse("thousandSep", ","),
    decimalSep = o.getOrElse("decimalSep", "."),
    normalizeNumerics = o.getOrElse("normalizeNumerics", "true").toBoolean,
    dropEmptyFirstField = o.getOrElse("dropEmptyFirstField", "true").toBoolean)

  def textFormat(o: Opts): TextFormat = TextFormat(
    header = csvList(o("header")),
    targetHeader = o.get("targetHeader").map(csvList).getOrElse(Nil),
    sep = o.getOrElse("sep", "\t"),
    sepIsRegex = o.getOrElse("sepIsRegex", "false").toBoolean,
    quoted = o.getOrElse("quoted", "false").toBoolean,
    skip = o.getOrElse("skip", "0").toInt,
    skipUntil = o.get("skipUntil"),
    eol = o.getOrElse("eol", "\r?\n"),
    encoding = o.getOrElse("encoding", "UTF-8"),
    allowLinefeedInData = o.getOrElse("allowLinefeedInData", "false").toBoolean,
    thousandSep = o.getOrElse("thousandSep", ","),
    decimalSep = o.getOrElse("decimalSep", "."),
    normalizeNumerics = o.getOrElse("normalizeNumerics", "true").toBoolean,
    dropEmptyFirstField = o.getOrElse("dropEmptyFirstField", "true").toBoolean)

  def dataColumns(kind: String, o: Opts): Seq[String] = kind match {
    case "graft-xml" => xmlFormat(o).header
    case "graft-fixed" => fixedFormat(o).targets
    case "graft-text" => textFormat(o).targets
    case _ => excelFormat(o).targets
  }

  def fullSchema(kind: String, o: Opts): StructType = StructType(
    StructField("_file", StringType) +: StructField("_lineno", LongType) +:
      dataColumns(kind, o).map(StructField(_, StringType)))

  /** `load(paths…)` → `paths` JSON array; `load(path)` → `path`. */
  def inputPaths(o: Opts): Seq[String] = {
    val multi = o.get("paths").map { json =>
      // minimal JSON string-array parse (values are paths, no escapes in
      // practice; tolerate \" and \\ anyway)
      val s = json.trim.stripPrefix("[").stripSuffix("]")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inStr = false; var esc = false
      s.foreach { c =>
        if (esc) { sb.append(c); esc = false }
        else if (c == '\\') esc = true
        else if (c == '"') { if (inStr) { out += sb.toString; sb.clear() }; inStr = !inStr }
        else if (inStr) sb.append(c)
      }
      out.toSeq
    }.getOrElse(Seq.empty)
    val single = o.get("path").toSeq
    val all = multi ++ single
    if (all.isEmpty) throw new IllegalArgumentException("no path given to load()")
    all
  }

  /** Spark-`trim` parity: strip ' ' only (Java `trim` also strips
    * control chars — a semantic the classic fixed-width path never had). */
  def trimSpaces(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** Minimal quoted-CSV line split (Text::CSV semantics like the classic
    * path's `from_csv`: quotes only where needed, doubled quote inside a
    * quoted field = literal quote). `sep` is a literal string here. */
  def splitQuoted(line: String, sep: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = line.length
    while (i <= n) { // one field per iteration
      if (i == n) { out += ""; i += 1 } // sep at EOL → trailing empty field
      else if (line.charAt(i) == '"') {
        // quoted field: scan to the closing quote ("" = literal ")
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (!closed && j < n) {
          val c = line.charAt(j)
          if (c == '"') {
            if (j + 1 < n && line.charAt(j + 1) == '"') { sb.append('"'); j += 2 }
            else { closed = true; j += 1 }
          } else { sb.append(c); j += 1 }
        }
        out += sb.toString
        i = if (j < n && line.startsWith(sep, j)) j + sep.length else n + 1
      } else {
        val next = line.indexOf(sep, i)
        if (next < 0) { out += line.substring(i); i = n + 1 }
        else { out += line.substring(i, next); i = next + sep.length }
      }
    }
    out.toIndexedSeq
  }

  /** Per-file text parse with projection — mirrors
    * [[graft.sources.TextSource.read]]'s semantics (skip/skipUntil, empty
    * lines dropped before numbering, trim + normalizeNumerics,
    * dropEmptyFirstField after numbering) for all three line modes:
    * fixed-width spans, quoted CSV, and plain/regex separator split. Only
    * `wanted` columns pay per-field cleanup (and fixed-width only
    * substrings wanted spans). */
  /** Which pushed filters this source can exploit, and how:
    *
    *  - `_file` predicates (equality, IN, prefix/suffix/contains) prune
    *    the driver-side FILE LISTING — the DSv2 analogue of partition
    *    pruning. A staging directory of thousands of drop files queried
    *    for one file plans one input partition, not thousands.
    *  - `_lineno` upper bounds (`=`, `<`, `<=`) stop the text/fixed
    *    parser EARLY — a header-probe query over multi-GB drop files
    *    parses k lines per file instead of all of them.
    *
    * Every accepted filter is ALSO returned as a residual for Spark to
    * re-evaluate (the pruning is sufficient for `_file` and upper-bound
    * `_lineno`, but re-checking costs one codegen'd comparison and keeps
    * the contract trivially safe — e.g. `_lineno = 5` prunes to the
    * first 5 lines, the residual selects the 5th). */
  def acceptsFilter(kind: String, f: Filter): Boolean = f match {
    case EqualTo("_file", _: String) => true
    case In("_file", vs) => vs.forall(_.isInstanceOf[String])
    case StringStartsWith("_file", _) | StringEndsWith("_file", _) |
         StringContains("_file", _) => true
    case EqualTo("_lineno", _: Number) | LessThan("_lineno", _: Number) |
         LessThanOrEqual("_lineno", _: Number) =>
      kind == "graft-text" || kind == "graft-fixed"
    case _ => false
  }

  /** The parse-stop bound implied by the pushed `_lineno` filters:
    * lines numbered above it can never satisfy them. */
  def linenoBound(pushed: Seq[Filter]): Long =
    pushed.collect {
      case EqualTo("_lineno", n: Number) => n.longValue
      case LessThanOrEqual("_lineno", n: Number) => n.longValue
      // saturating subtraction: a degenerate `< Long.MinValue` filter
      // would wrap to Long.MaxValue and silently disable the early-stop
      // (residual keeps values correct either way; this keeps pruning)
      case LessThan("_lineno", n: Number) =>
        if (n.longValue == Long.MinValue) Long.MinValue else n.longValue - 1
    }.foldLeft(Long.MaxValue)(math.min)

  /** Does `path` survive the pushed `_file` predicates? Compared against
    * the same string the `_file` column carries (the partition's path),
    * so pruning can never disagree with row values. */
  def fileSurvives(pushed: Seq[Filter], path: String): Boolean =
    pushed.forall {
      case EqualTo("_file", v: String) => path == v
      case In("_file", vs) => vs.exists(v => v == path)
      case StringStartsWith("_file", p) => path.startsWith(p)
      case StringEndsWith("_file", s) => path.endsWith(s)
      case StringContains("_file", s) => path.contains(s)
      case _ => true // _lineno filters don't constrain the file set
    }

  def textProjected(path: String, content: Array[Byte], fmt: TextFormat,
                    wanted: Seq[String], maxLineno: Long = Long.MaxValue): Iterator[Seq[Any]] = {
    val text = new String(content, java.nio.charset.Charset.forName(fmt.encoding))
    val recSep = if (fmt.allowLinefeedInData) "\r\n" else fmt.eol
    val lines = text.split(recSep, -1).iterator.zipWithIndex
    val afterSkip: Iterator[String] = fmt.skipUntil match {
      case Some(pattern) =>
        val rx = pattern.r
        var found = false
        lines.collect { case (l, _) if found || {
          if (rx.findFirstIn(l).isDefined) found = true; false } => l }
      case None => lines.collect { case (l, idx) if idx >= fmt.skip => l }
    }
    def clean(s: String): String = {
      val t = trimSpaces(s)
      if (fmt.normalizeNumerics)
        Coerce.normalizeNumerics(t, fmt.thousandSep, fmt.decimalSep)
      else t
    }
    // raw line → positional field lookup (fixed: lazy per-span substring;
    // split modes: one split, then per-index access — nulls past the end
    // like the classic path's element_at)
    val sepRegex =
      if (fmt.isFixedWidth || fmt.quoted) null
      else if (fmt.sepIsRegex) fmt.sep.r.pattern
      else java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(fmt.sep))
    def fields(raw: String): Int => String =
      if (fmt.isFixedWidth) { i =>
        val (start, end) = fmt.poslen(i)
        val s = math.min(start, raw.length)
        val e = math.min(end, raw.length)
        clean(if (e > s) raw.substring(s, e) else "")
      } else if (fmt.quoted) {
        val parts = splitQuoted(raw, fmt.sep)
        i => if (i < parts.length) clean(parts(i)) else null
      } else {
        val parts = sepRegex.split(raw, -1)
        i => if (i < parts.length) clean(parts(i)) else null
      }
    val idxByTarget: Map[String, Int] = fmt.targets.zipWithIndex.toMap
    var lineno = 0L
    // `lineno` counts rows already emitted; once it reaches the pushed
    // upper bound, no later line can satisfy the filters — stop parsing
    afterSkip.filter(_.nonEmpty).takeWhile(_ => lineno < maxLineno).flatMap { raw =>
      lineno += 1
      val f = fields(raw)
      if (fmt.dropEmptyFirstField && {
        val v = f(0); v == null || v.isEmpty }) None
      else {
        val n = lineno
        Some(wanted.map {
          case "_file"   => path
          case "_lineno" => n
          case t => f(idxByTarget.getOrElse(t,
            throw new IllegalArgumentException(s"unknown column $t")))
        })
      }
    }
  }
}

/** One file = one non-splittable partition. */
final case class GraftInputPartition(path: String) extends InputPartition

final class GraftPartitionReaderFactory(
    kind: String, options: Map[String, String], wanted: Seq[String],
    maxLineno: Long = Long.MaxValue)
  extends PartitionReaderFactory {
  import GraftDataSourceV2._

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val filePath = p.asInstanceOf[GraftInputPartition].path
    new PartitionReader[InternalRow] {
      private val rows: Iterator[Seq[Any]] = {
        val o = opts(options.asJava)
        val hPath = new org.apache.hadoop.fs.Path(filePath)
        // executors resolve the FS from their own site config — no driver
        // state needs shipping, and every Hadoop-compatible FS works
        val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(hPath)
        val content = try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        } finally in.close()
        kind match {
          case "graft-xlsx" =>
            val fmt = excelFormat(o)
            val (cells, maxRow) = XlsxSource.sheetCells(content, fmt)
            ExcelRows.emitProjected(filePath, cells, maxRow, fmt, wanted)
          case "graft-xls" =>
            val fmt = excelFormat(o)
            val (cells, maxRow) = XlsSource.sheetCells(filePath, content, fmt)
            ExcelRows.emitProjected(filePath, cells, maxRow, fmt, wanted)
          case "graft-xml" =>
            XmlSource.parseProjected(filePath, content, xmlFormat(o), wanted)
          case "graft-fixed" =>
            textProjected(filePath, content, fixedFormat(o), wanted, maxLineno)
          case "graft-text" =>
            textProjected(filePath, content, textFormat(o), wanted, maxLineno)
          case other =>
            throw new IllegalStateException(s"unknown graft format $other")
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val vs = rows.next()
          val arr = new Array[Any](vs.length)
          var i = 0
          vs.foreach { v =>
            arr(i) = v match {
              case s: String => UTF8String.fromString(s)
              case other => other // Long _lineno or null
            }
            i += 1
          }
          current = new GenericInternalRow(arr)
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

final class GraftScan(kind: String, options: Map[String, String],
                      required: StructType,
                      pushed: Seq[Filter] = Seq.empty)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  import GraftDataSourceV2._
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // one driver-side listing serves partition planning AND statistics;
  // pushed `_file` predicates prune it BEFORE partitions are planned
  private lazy val files: Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    inputPaths(opts(options.asJava)).flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      if (matched.isEmpty)
        throw new java.io.FileNotFoundException(s"no files match $p")
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(f => !f.isDirectory &&
            !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        else Seq(st)
      }
    }.filter(st => fileSurvives(pushed, st.getPath.toString))
  }
  override def planInputPartitions(): Array[InputPartition] =
    files.map(st => GraftInputPartition(st.getPath.toString): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftPartitionReaderFactory(kind, options, required.fieldNames.toSeq,
      linenoBound(pushed))
  /** Without statistics a DSv2 relation reports `defaultSizeInBytes`
    * (effectively infinite), so a small workbook/XML dim joined to a fact
    * table would never broadcast. Total file size is an upper bound on
    * the materialized size for these row-oriented formats — good enough
    * for the broadcast-threshold decision that matters at scale. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, files.map(_.getLen).sum))
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  override def description(): String =
    s"$kind ReadSchema: ${required.fieldNames.mkString(", ")}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

final class GraftScanBuilder(kind: String, schema: StructType,
                             options: Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  import GraftDataSourceV2._
  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep the table's field order; Spark may hand fields in any order
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(schema.fields.filter(f => keep.contains(f.name)))
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => acceptsFilter(kind, f))
    // everything stays residual: the source prunes files / stops the
    // parser early, Spark still applies the exact predicates
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new GraftScan(kind, options, required, pushed.toSeq)
}

final class GraftFormatTable(kind: String, tableSchema: StructType,
                             properties: util.Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = kind
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table properties (from getTable) with per-scan options; the
    // scan's map carries the read paths
    val merged = new util.HashMap[String, String](properties)
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new GraftScanBuilder(kind, tableSchema,
      merged.asScala.toMap)
  }
}

abstract class GraftProviderBase(kind: String)
  extends TableProvider with DataSourceRegister {
  import GraftDataSourceV2._
  override def shortName(): String = kind
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    fullSchema(kind, opts(options.asCaseSensitiveMap()))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftFormatTable(kind, schema, properties)
}

final class GraftXlsxProvider extends GraftProviderBase("graft-xlsx")
final class GraftXlsProvider extends GraftProviderBase("graft-xls")
final class GraftXmlProvider extends GraftProviderBase("graft-xml")
final class GraftFixedProvider extends GraftProviderBase("graft-fixed")
final class GraftTextProvider extends GraftProviderBase("graft-text")
