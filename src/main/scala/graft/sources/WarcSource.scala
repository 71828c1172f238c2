package graft.sources.warc

import java.io.{BufferedInputStream, DataOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** WARC (Web ARChive, ISO 28500 — the CommonCrawl container) ingestion as
  * a native DataSource V2 batch source: the missing first mile between a
  * crawled 100 TB dump and every curation operator in `graft.ops`.
  *
  * Usage: `spark.read.format("warc").load(dir)` (or
  * [[graft.sources.Sources.warc]]); schema:
  * (path, record_id, warc_type, url, ts, mime, content_length, payload).
  *
  * Scale design:
  *  - ONE InputPartition per file — WARC has no block-aligned sync marks
  *    and CommonCrawl gzips are member-per-record streams, so arbitrary
  *    offset splitting is not possible without a speculative scan;
  *    crawl dumps ship as ~1 GB files precisely so that file granularity
  *    IS the parallelism unit (1000 executors ↔ 1000s of files).
  *  - BOUNDED MEMORY per task: records stream one at a time off the
  *    (optionally gzip) input; only the current record's headers and —
  *    only if the query projects it — its payload are resident. Header
  *    lines are capped ([[WarcSource.MaxHeaderLine]]), payloads by the
  *    `maxPayloadBytes` option; an over-cap record fails LOUDLY (refuse,
  *    never silently truncate — raise the cap or prune the column).
  *  - COLUMN PRUNING reaches the reader (SupportsPushDownRequiredColumns):
  *    a metadata-only query (`select url, mime`) SKIPS every payload's
  *    bytes instead of materializing them — the catalog/audit pass over
  *    a dump pays header cost only.
  *  - Corrupt input fails loudly with file+record context: bad magic,
  *    missing mandatory headers, short payloads, and missing record
  *    separators are refused, not skipped — silent drop is how a corpus
  *    loses a shard without anyone noticing.
  *
  * Gzip: `.warc.gz` streams decode through the JDK inflater; multi-member
  * files (the member-per-record CommonCrawl layout) decode seamlessly
  * (JDK GZIPInputStream concatenated-member behavior).
  */
object WarcSource {
  val MaxHeaderLine = 64 * 1024
  val DefaultMaxPayload: Long = 64L * 1024 * 1024
  /** Plain .warc files larger than this split into byte-range
    * partitions (option `splitSizeBytes`); gzip never splits. */
  val DefaultSplitSize: Long = 128L * 1024 * 1024

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WarcTable(new CaseInsensitiveStringMap(properties))
}

class WarcTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"warc(${WarcTable.paths(options).mkString(",")})"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(o)
}

object WarcTable {
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      // Spark encodes .load(paths: _*) as a JSON array; a dependency-free
      // parse is fine for the path strings Spark itself emitted
      js.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
        .filter(_.nonEmpty)
    }
    multi.getOrElse(Option(options.get("path")).toSeq)
  }
}

class WarcScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WarcScan(options, required)
}

class WarcScan(options: CaseInsensitiveStringMap, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val splitSize = Option(options.get("splitSizeBytes")).map(_.toLong)
      .getOrElse(WarcSource.DefaultSplitSize)
    require(splitSize >= 1024, s"splitSizeBytes too small: $splitSize")
    val files = WarcTable.paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath)
          .filter(f => f.getName.endsWith(".warc") || f.getName.endsWith(".warc.gz"))
          .map(fp => fs.getFileStatus(fp))
      else Seq(st)
    }
    require(files.nonEmpty,
      s"warc source found no .warc/.warc.gz files under ${WarcTable.paths(options)}")
    files.sortBy(_.getPath.toString).flatMap { st =>
      val p = st.getPath.toString
      // gzip streams are not seekable mid-member: whole file per task
      // (crawl dumps ship ~1 GB gz files — file granularity IS the
      // intended split there). Plain .warc splits by byte range with
      // record-boundary sync (see the reader's contract).
      if (p.endsWith(".gz") || st.getLen <= splitSize)
        Seq(WarcInputPartition(p, 0L, Long.MaxValue))
      else {
        val n = ((st.getLen + splitSize - 1) / splitSize).toInt
        (0 until n).map { i =>
          val start = i.toLong * splitSize
          val end = math.min(st.getLen, start + splitSize)
          WarcInputPartition(p, start, end)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val maxPayload = Option(options.get("maxPayloadBytes")).map(_.toLong)
      .getOrElse(WarcSource.DefaultMaxPayload)
    WarcReaderFactory(required, conf, maxPayload)
  }
}

/** `[start, end)` byte range of `path`; a partition owns exactly the
  * records whose FIRST byte lies in its range (reads run past `end` to
  * finish the last owned record — standard split semantics). */
case class WarcInputPartition(path: String, start: Long, end: Long)
    extends InputPartition

case class WarcReaderFactory(required: StructType,
    conf: SerializableConfiguration, maxPayload: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val wp = p.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(wp.path, wp.start, wp.end, required, conf,
      maxPayload)
  }
}

/** Streaming range reader: one record resident at a time.
  *
  * SPLIT SYNC (plain .warc, `start > 0`): WARC has no escape-safe sync
  * marks, so the reader scans from `start − 4` for the inter-record
  * `CRLF CRLF "WARC/"` pattern and VALIDATES each candidate by parsing
  * a full header block (version + headers with mandatory Content-Length
  * and WARC-Date) through an independent probe stream — a payload that
  * merely contains the magic bytes fails validation and the scan
  * continues. This is the standard Hadoop-style container-splitting
  * trust model: it assumes container integrity (a payload embedding a
  * COMPLETE well-formed WARC record at the scanned boundary would be
  * double-read); for adversarial payloads use gzip members or
  * `splitSizeBytes` ≥ file size, both of which read at file granularity
  * with the strict corrupt-refuse contract everywhere. */
class WarcPartitionReader(pathStr: String, startOffset: Long, endOffset: Long,
    required: StructType, conf: SerializableConfiguration, maxPayload: Long)
    extends PartitionReader[InternalRow] {

  private val path = new Path(pathStr)
  private val fs = path.getFileSystem(conf.value)
  private val isGz = pathStr.endsWith(".gz")
  /** Absolute offset of the next unconsumed byte (plain files only). */
  private var pos: Long = 0L
  private final class Counting(s: InputStream)
      extends java.io.FilterInputStream(s) {
    override def read(): Int = {
      val b = super.read(); if (b >= 0) pos += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val k = super.read(b, off, len); if (k > 0) pos += k; k
    }
  }
  private def openAt(offset: Long): InputStream = {
    val base = fs.open(path)
    if (isGz) new GZIPInputStream(base, 64 * 1024)
    else {
      base.seek(offset)
      pos = offset
      new Counting(new BufferedInputStream(base, 64 * 1024))
    }
  }
  private var raw: InputStream = openAt(if (isGz) 0L else startOffset)
  private var exhausted = false
  if (!isGz && startOffset > 0L) syncToRecordStart()

  private val needPayload = required.fieldNames.contains("payload")
  private var recordIdx = 0L
  private var row: InternalRow = _

  /** Scan forward for the first VALIDATED record start in
    * [startOffset, endOffset); reposition there, or mark the partition
    * exhausted (a record spanning the whole range belongs to the
    * partition owning its first byte). */
  private def syncToRecordStart(): Unit = {
    raw.close()
    val scan = fs.open(path)
    try {
      var at = math.max(0L, startOffset - 1)
      scan.seek(at)
      // "\nWARC/": a record's version line always follows an LF (the
      // previous record's separator, blank-line tolerant). The pattern
      // has NO self-overlap ('\n' appears only at position 0), so the
      // simple restart below is exact — a hand-rolled KMP over an
      // overlapping pattern like CRLFCRLF is precisely where a missed
      // boundary (= silently lost records) would hide.
      val pat = Array[Byte]('\n', 'W', 'A', 'R', 'C', '/')
      var matched = 0
      val buf = new Array[Byte](64 * 1024)
      var found = -1L
      while (found < 0 && at < endOffset + pat.length) {
        val k = scan.read(buf, 0, buf.length)
        if (k < 0) { at = Long.MaxValue }
        else {
          var i = 0
          while (found < 0 && i < k) {
            val b = buf(i)
            if (b == pat(matched)) {
              matched += 1
              if (matched == pat.length) {
                val cand = at + i + 1 - pat.length + 1 // the 'W'
                if (cand >= startOffset && cand < endOffset &&
                    validRecordAt(cand)) found = cand
                else matched = 0
              }
            } else matched = if (b == pat(0)) 1 else 0
            i += 1
          }
          at += k
        }
      }
      if (found >= 0) raw = openAt(found) else exhausted = true
    } finally scan.close()
  }

  /** Probe `cand` through an independent stream: true iff a full valid
    * header block (version + mandatory headers) parses there. */
  private def validRecordAt(cand: Long): Boolean = {
    val probe = fs.open(path)
    try {
      probe.seek(cand)
      val in = new BufferedInputStream(probe, 8 * 1024)
      def line(): String = {
        val sb = new java.lang.StringBuilder(64)
        var b = in.read()
        while (b >= 0 && b != '\n' && sb.length <= WarcSource.MaxHeaderLine) {
          if (b != '\r') sb.append(b.toChar)
          b = in.read()
        }
        if (b != '\n') null else sb.toString
      }
      val v = line()
      if (v == null || !v.startsWith("WARC/")) return false
      var sawLen = false
      var sawDate = false
      var l = line()
      var nHeaders = 0
      while (l != null && l.nonEmpty && nHeaders < 1000) {
        val i = l.indexOf(':')
        if (i <= 0) return false
        val k = l.substring(0, i).trim.toLowerCase
        if (k == "content-length" &&
            l.substring(i + 1).trim.matches("\\d+")) sawLen = true
        if (k == "warc-date") sawDate = true
        nHeaders += 1
        l = line()
      }
      l != null && l.isEmpty && sawLen && sawDate
    } catch { case _: java.io.IOException => false
    } finally probe.close()
  }

  private def fail(msg: String): Nothing =
    throw new java.io.IOException(
      s"corrupt WARC $pathStr (record $recordIdx): $msg")

  /** One CRLF-terminated header line; None on clean EOF at line start. */
  private def readLine(): Option[String] = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = raw.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') {
      if (b != '\r') buf.write(b)
      if (buf.size > WarcSource.MaxHeaderLine) fail("header line exceeds cap")
      b = raw.read()
    }
    if (b < 0) fail("EOF inside a header line")
    Some(new String(buf.toByteArray, StandardCharsets.UTF_8))
  }

  private def readFully(n: Long): Array[Byte] = {
    if (n > Int.MaxValue - 16) fail(s"payload of $n bytes exceeds array cap")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = raw.read(out, off, n.toInt - off)
      if (k < 0) fail(s"EOF after $off of $n payload bytes")
      off += k
    }
    out
  }

  private def skipFully(n: Long): Unit = {
    var left = n
    val tmp = new Array[Byte](64 * 1024)
    while (left > 0) {
      val k = raw.read(tmp, 0, math.min(left, tmp.length.toLong).toInt)
      if (k < 0) fail(s"EOF with $left payload bytes left to skip")
      left -= k
    }
  }

  override def next(): Boolean = {
    if (exhausted) return false
    // skip inter-record blank lines (the two CRLFs after the previous
    // payload are consumed with the payload; tolerate extras), tracking
    // where the version line STARTS — the range-ownership boundary
    var lineStart = pos
    var first: Option[String] = readLine()
    while (first.exists(_.isEmpty)) { lineStart = pos; first = readLine() }
    first match {
      case None => false
      case Some(version) =>
        if (!isGz && lineStart >= endOffset) { exhausted = true; return false }
        recordIdx += 1
        if (!version.startsWith("WARC/")) fail(s"bad magic '$version'")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var line = readLine().getOrElse(fail("EOF inside header block"))
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          if (i <= 0) fail(s"malformed header line '$line'")
          headers(line.substring(0, i).trim.toLowerCase) =
            line.substring(i + 1).trim
          line = readLine().getOrElse(fail("EOF inside header block"))
        }
        val len = headers.getOrElse("content-length",
          fail("missing mandatory Content-Length")).toLong
        if (len < 0) fail(s"negative Content-Length $len")
        val date = headers.getOrElse("warc-date",
          fail("missing mandatory WARC-Date"))
        val tsMicros = try {
          val inst = java.time.Instant.parse(date)
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        } catch { case _: java.time.format.DateTimeParseException =>
          fail(s"unparseable WARC-Date '$date'")
        }
        val payload: Array[Byte] =
          if (needPayload) {
            if (len > maxPayload) fail(
              s"payload of $len bytes exceeds maxPayloadBytes=$maxPayload " +
                "(raise the option or prune the payload column)")
            readFully(len)
          } else { skipFully(len); null }
        // mandatory record separator: exactly two CRLFs after the block
        val sep = new Array[Byte](4)
        var off = 0
        while (off < 4) {
          val k = raw.read(sep, off, 4 - off)
          if (k < 0) fail("EOF inside the record separator")
          off += k
        }
        if (!java.util.Arrays.equals(sep,
            Array[Byte]('\r', '\n', '\r', '\n'))) fail("missing CRLFCRLF record separator")
        def s(name: String): Any =
          headers.get(name).map(UTF8String.fromString).orNull
        val full = Map[String, Any](
          "path" -> UTF8String.fromString(pathStr),
          "record_id" -> s("warc-record-id"),
          "warc_type" -> s("warc-type"),
          "url" -> s("warc-target-uri"),
          "ts" -> tsMicros,
          "mime" -> s("content-type"),
          "content_length" -> len,
          "payload" -> payload)
        row = new GenericInternalRow(
          required.fieldNames.map(full(_)).toArray[Any])
        true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = raw.close()
}

/** Minimal WARC writer — fixtures, tests, and the re-shard sink side.
  * Driver-side by design (callers parallelize at file granularity). */
object WarcIO {
  final case class Record(recordId: String, warcType: String, url: String,
      tsIso: String, mime: String, payload: Array[Byte])

  def write(records: Iterator[Record], out: java.io.OutputStream): Unit = {
    val o = new DataOutputStream(out)
    def wl(s: String): Unit = {
      o.write(s.getBytes(StandardCharsets.UTF_8)); o.write('\r'); o.write('\n')
    }
    records.foreach { r =>
      wl("WARC/1.0")
      wl(s"WARC-Record-ID: ${r.recordId}")
      wl(s"WARC-Type: ${r.warcType}")
      wl(s"WARC-Target-URI: ${r.url}")
      wl(s"WARC-Date: ${r.tsIso}")
      wl(s"Content-Type: ${r.mime}")
      wl(s"Content-Length: ${r.payload.length}")
      wl("")
      o.write(r.payload)
      wl(""); wl("")
    }
    o.flush()
  }

  def writeFile(records: Iterator[Record], path: String): Unit = {
    val fileOut = new java.io.FileOutputStream(path)
    val out = if (path.endsWith(".gz")) new GZIPOutputStream(fileOut) else fileOut
    try write(records, out) finally { out match {
      case g: GZIPOutputStream => g.finish(); g.close()
      case other => other.close()
    } }
  }
}
