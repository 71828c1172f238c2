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
    val files = WarcTable.paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq.filter(_.isFile).map(_.getPath)
          .filter(f => f.getName.endsWith(".warc") || f.getName.endsWith(".warc.gz"))
      else Seq(path)
    }
    require(files.nonEmpty,
      s"warc source found no .warc/.warc.gz files under ${WarcTable.paths(options)}")
    files.sortBy(_.toString).map(f => WarcInputPartition(f.toString)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val maxPayload = Option(options.get("maxPayloadBytes")).map(_.toLong)
      .getOrElse(WarcSource.DefaultMaxPayload)
    WarcReaderFactory(required, conf, maxPayload)
  }
}

case class WarcInputPartition(path: String) extends InputPartition

case class WarcReaderFactory(required: StructType,
    conf: SerializableConfiguration, maxPayload: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].path,
      required, conf, maxPayload)
}

/** Streaming single-file reader: one record resident at a time. */
class WarcPartitionReader(pathStr: String, required: StructType,
    conf: SerializableConfiguration, maxPayload: Long)
    extends PartitionReader[InternalRow] {

  private val path = new Path(pathStr)
  private val raw: InputStream = {
    val fs = path.getFileSystem(conf.value)
    val base = fs.open(path)
    if (pathStr.endsWith(".gz")) new GZIPInputStream(base, 64 * 1024)
    else new BufferedInputStream(base, 64 * 1024)
  }
  private val needPayload = required.fieldNames.contains("payload")
  private var recordIdx = 0L
  private var row: InternalRow = _

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
    // skip inter-record blank lines (the two CRLFs after the previous
    // payload are consumed with the payload; tolerate extras)
    var first: Option[String] = readLine()
    while (first.exists(_.isEmpty)) first = readLine()
    first match {
      case None => false
      case Some(version) =>
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
