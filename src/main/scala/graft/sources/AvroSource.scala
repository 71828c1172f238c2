package graft.sources.avro

import java.io.OutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
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

/** Avro Object Container File source/sink — the remaining common
  * interchange format next to parquet/ORC/JSONL/CSV (Kafka archives,
  * Sqoop-era lake drops, schema-registry pipelines all ship it). Built
  * directly on the `org.apache.avro` core library as a native
  * DataSource V2 batch source (`spark.read.format("graft-avro")`), the
  * [[graft.sources.warc.WarcDataSource]] pattern.
  *
  * Scale design:
  *  - BLOCK-SPLITTABLE: container files carry 16-byte sync markers
  *    between blocks, so (unlike WARC/gzip-JSONL) a file splits into
  *    byte-range InputPartitions exactly like parquet row groups — the
  *    reader `sync(start)`s to the first block whose first byte lies in
  *    its range and reads until `pastSync(end)`; every block is owned by
  *    exactly one partition (the Hadoop AvroInputFormat contract).
  *  - COLUMN PRUNING reaches the DECODER: the reader passes the pruned
  *    catalyst schema as the Avro READER schema, so Avro's schema
  *    resolution skips non-projected fields byte-wise instead of
  *    materializing them (row-major skip, not columnar elision —
  *    documented trade vs parquet; the audit-query economics still hold).
  *  - BOUNDED MEMORY: one decompressed block resident per task.
  *  - Corrupt input fails LOUDLY (avro's magic/sync/CRC checks throw;
  *    nothing is skipped silently).
  *
  * Type surface (loud boundary, mirrored by writer and reader):
  * boolean/int/long/float/double/string/bytes, each optionally
  * nullable as the `["null", T]` union — the flat relational subset
  * every interchange drop in this engine uses. Logical types, nested
  * records, arrays, maps and enums are refused at schema-mapping time
  * with the exact offending field named (extend the mapping, never
  * guess a coercion).
  */
object AvroSource {

  /** Plain files larger than this split into byte-range partitions. */
  val DefaultSplitSize: Long = 128L * 1024 * 1024

  /** Abandoned-staging sweep age gate: `.graft-staging-*` dirs older
    * than this at the next write to the same path are deleted (a killed
    * driver never reaches its cleanup `finally`; readers never list
    * staging dirs, but disk does). Old enough that no live job's
    * staging dir can trip it. */
  val StaleStagingMaxAgeMs: Long = 24L * 3600 * 1000

  // ---- schema mapping (the ONE definition; writer + reader share it) ----

  def avroTypeFor(dt: DataType, field: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case other => throw new IllegalArgumentException(
      s"graft-avro: unsupported Spark type $other for field '$field' — " +
        "supported: boolean/int/long/float/double/string/binary " +
        "(nullable as [null, T] unions)")
  }

  def avroSchemaFor(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroTypeFor(f.dataType, f.name)
      val t = if (f.nullable)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("graft_row", null, "graft", false,
      java.util.List.of(fields: _*))
  }

  def catalystTypeFor(s: Schema, field: String): (DataType, Boolean) = {
    def base(b: Schema): DataType = b.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"graft-avro: unsupported Avro type $other for field '$field'")
    }
    s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        require(branches.size == 2 &&
          branches.exists(_.getType == Schema.Type.NULL),
          s"graft-avro: only [null, T] unions supported, field '$field' " +
            s"has $s")
        (base(branches.find(_.getType != Schema.Type.NULL).get), true)
      case _ => (base(s), false)
    }
  }

  def structTypeFor(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"graft-avro: top-level schema must be a record, got ${avro.getType}")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = catalystTypeFor(f.schema(), f.name())
      StructField(f.name(), dt, nullable)
    })
  }

  // ---- write path --------------------------------------------------------

  /** Write `df` as one container file per non-empty partition
    * (`part-NNNNN.avro`) through the Hadoop FileSystem API (works on any
    * filesystem the session can reach). `codec`: "null" (default) or
    * "deflate" (JDK zlib — portable, no native lib).
    *
    * `mode` mirrors the DataFrameWriter vocabulary the parquet mirrors
    * rely on, loudly:
    *  - "error" (default): refuse if the target already holds container
    *    files — silently merging a re-write's parts with a previous
    *    run's stale `part-NNNNN.avro` (the reader lists ALL of them) is
    *    the one corruption this sink could produce invisibly;
    *  - "overwrite": write the new parts, then swap — publish first
    *    (per-file-atomic OVERWRITE renames), delete stale leftovers
    *    last, so a failed job leaves the previous dataset intact and
    *    even a crash mid-swap can only leave a mixed superseded-name
    *    state, never an empty or name-missing one.
    *
    * JOB-LEVEL commit protocol: tasks stream to attempt-unique temp
    * names under a per-job staging dir and publish within it via an
    * OVERWRITE-semantics rename (`FileContext.rename(OVERWRITE)` — no
    * exists→delete→rename window for a speculative twin to race: the
    * committed file is never absent), and the driver moves the staged
    * parts into the target exactly once after the job succeeds, before
    * any stale deletion. A failed or abandoned job leaves only a
    * staging dir, removed in the finally. */
  def write(df: DataFrame, path: String, codec: String = "null",
      mode: String = "error"): Unit = {
    require(codec == "null" || codec == "deflate",
      s"graft-avro: codec must be null or deflate, got '$codec'")
    require(mode == "error" || mode == "overwrite",
      s"graft-avro: mode must be error or overwrite, got '$mode'")
    val schemaJson = avroSchemaFor(df.schema).toString
    val names = df.schema.fieldNames
    val conf = new SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    def stale(): Seq[Path] = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .map(_.getPath)
    if (mode == "error") {
      val existing = stale()
      require(existing.isEmpty,
        s"graft-avro: $path already holds ${existing.size} container " +
          "file(s) — a re-write would merge with them on read; pass " +
          "mode=\"overwrite\" to replace the dataset")
    }
    // sweep ABANDONED staging dirs (a killed driver never reaches its
    // finally): readers never list them, but they leak disk forever.
    // Age-gated on the writer's START TIME recorded in the dir NAME —
    // not directory mtime, which object stores (and long jobs that
    // staged parts early) do not reliably advance, so an mtime gate
    // could sweep a LIVE job's staging dir out from under it. Legacy
    // unstamped names fall back to mtime. Jobs running longer than
    // StaleStagingMaxAgeMs remain the documented limit of this sweep
    // (a concurrent writer would reclaim their staging mid-job).
    val cutoff = System.currentTimeMillis() - StaleStagingMaxAgeMs
    // the embedded timestamp is trusted only at plausible epoch-millis
    // widths (12-17 digits = 2001..far future): a LEGACY unstamped dir
    // whose UUID starts with an all-decimal group would otherwise parse
    // as an 8-digit "epoch" near 1970 and a LIVE writer's staging would
    // be swept despite a fresh mtime — exactly the hazard the mtime
    // fallback exists to cover
    def stagedAtMs(name: String): Option[Long] = {
      val rest = name.stripPrefix(".graft-staging-")
      val ts = rest.takeWhile(_.isDigit)
      if (ts.length >= 12 && ts.length <= 17 &&
          rest.lift(ts.length).contains('-'))
        Some(ts.toLong)
      else None
    }
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".graft-staging-") &&
        stagedAtMs(st.getPath.getName)
          .getOrElse(st.getModificationTime) < cutoff)
      .foreach(st => fs.delete(st.getPath, true))
    val staging = new Path(dir,
      s".graft-staging-${System.currentTimeMillis()}-" +
        s"${java.util.UUID.randomUUID()}")
    fs.mkdirs(staging)
    try {
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val fs = staging.getFileSystem(conf.value)
          val tmp = new Path(staging,
            f".part-$pid%05d-attempt${tc.taskAttemptId()}.avro.tmp")
          val fin = new Path(staging, f"part-$pid%05d.avro")
          val schema = new Schema.Parser().parse(schemaJson)
          val out: OutputStream = fs.create(tmp, true)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          if (codec == "deflate")
            w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
          w.create(schema, out)
          var committed = false
          try {
            it.foreach { row =>
              val rec = new GenericData.Record(schema)
              var i = 0
              while (i < names.length) {
                rec.put(i, toAvro(row.get(i)))
                i += 1
              }
              w.append(rec)
            }
            w.close() // closes `out`; container now complete
            // ATOMIC publish: rename-with-overwrite — concurrent
            // attempts write identical deterministic bytes, and the
            // committed name is never left missing mid-swap
            org.apache.hadoop.fs.FileContext
              .getFileContext(staging.toUri, conf.value)
              .rename(tmp, fin, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            committed = true
          } finally {
            if (!committed) {
              try w.close() catch { case _: Throwable => () }
              fs.delete(tmp, false) // abandon the attempt's bytes
            }
          }
        }
      }
      // job succeeded: swap — PUBLISH FIRST (per-file-atomic OVERWRITE
      // renames replace same-named stale parts in place), THEN delete
      // the stale leftovers the new part set did not cover. Nothing old
      // is deleted until every new part has landed, so a rename failure
      // or driver crash mid-swap can leave a superseded-name mix but
      // never an empty/partial dataset and never a missing name
      // (driver-side, once; no task ever touches the final names).
      val staged = fs.listStatus(staging).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      val newNames = staged.map(_.getPath.getName).toSet
      if (mode == "overwrite" && staged.isEmpty)
        // an all-empty-partitions DataFrame stages zero parts; letting
        // the stale sweep below run would silently destroy the previous
        // dataset and leave a directory the reader refuses to load
        require(stale().isEmpty,
          s"graft-avro: refusing to overwrite $path with an EMPTY " +
            "dataset (zero rows staged, existing container files " +
            "present) — delete the directory explicitly if intended")
      if (mode == "error") {
        // the start-of-write emptiness check must still hold — a
        // concurrent writer's containers appearing mid-job get a loud
        // refusal, not a silent clobber
        val foreign = stale()
        require(foreign.isEmpty,
          s"graft-avro: $path gained ${foreign.size} container file(s) " +
            "while the job ran (concurrent writer?) — refusing to merge " +
            "or clobber them")
      }
      val fc = org.apache.hadoop.fs.FileContext
        .getFileContext(dir.toUri, conf.value)
      staged.foreach { st =>
        fc.rename(st.getPath, new Path(dir, st.getPath.getName),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
      if (mode == "overwrite")
        stale().filterNot(p => newNames.contains(p.getName))
          .foreach(p => fs.delete(p, false))
    } finally fs.delete(staging, true)
  }

  private def toAvro(v: Any): Any = v match {
    case null => null
    case s: String => new Utf8(s)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other // boolean/int/long/float/double pass through
  }
}

class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true
  /** Schema from the FIRST file's embedded writer schema — one header
    * read, never a data pass (pass an explicit schema to skip even
    * that). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val first = AvroTable.files(options, conf).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft-avro: no .avro files under ${AvroTable.paths(options)}"))
    val in = new HadoopSeekableInput(first.getPath, conf)
    // a corrupt header throws from the CONSTRUCTOR — close the already-
    // open input ourselves or the driver leaks an fd per corrupt file
    val r = try new DataFileReader[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      catch { case e: Throwable => in.close(); throw e }
    try AvroSource.structTypeFor(r.getSchema) finally r.close()
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, new CaseInsensitiveStringMap(properties))
}

object AvroTable {
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    // Spark encodes .load(paths: _*) as a JSON array — parse it as one
    // (a naive strip/split corrupts any path containing a comma)
    val multi = Option(options.get("paths")).map { js =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
    }
    multi.getOrElse(Option(options.get("path")).toSeq)
  }

  /** The ONE directory-listing rule (inferSchema and the scan must see
    * the same file set): expand directories to their .avro files. */
  def files(options: CaseInsensitiveStringMap,
      conf: org.apache.hadoop.conf.Configuration)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    paths(options).flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq.filter(_.isFile)
          .filter(_.getPath.getName.endsWith(".avro"))
      else Seq(st)
    }.sortBy(_.getPath.toString)
}

class AvroTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-avro(${AvroTable.paths(options).mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, options)
}

class AvroScanBuilder(tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(options, required)
}

class AvroScan(options: CaseInsensitiveStringMap, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    val splitSize = Option(options.get("splitSizeBytes")).map(_.toLong)
      .getOrElse(AvroSource.DefaultSplitSize)
    require(splitSize >= 1024, s"splitSizeBytes too small: $splitSize")
    val files = AvroTable.files(options, conf) // the ONE listing rule
    require(files.nonEmpty,
      s"graft-avro: no .avro files under ${AvroTable.paths(options)}")
    files.flatMap { st =>
      val n = math.max(1L, (st.getLen + splitSize - 1) / splitSize).toInt
      (0 until n).map { i =>
        val start = i.toLong * splitSize
        val end = math.min(st.getLen, start + splitSize)
        AvroInputPartition(st.getPath.toString, start, end)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    AvroReaderFactory(required, conf)
  }
}

/** `[start, end)` byte range; the reader owns the blocks whose sync
  * marker precedes `end` and whose first byte is >= `start`. */
case class AvroInputPartition(path: String, start: Long, end: Long)
    extends InputPartition

case class AvroReaderFactory(required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[AvroInputPartition]
    new AvroPartitionReader(ap.path, ap.start, ap.end, required, conf)
  }
}

/** Hadoop FSDataInputStream as Avro SeekableInput. */
class HadoopSeekableInput(path: Path,
    conf: org.apache.hadoop.conf.Configuration) extends SeekableInput {
  private val fs = path.getFileSystem(conf)
  private val len = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  override def seek(p: Long): Unit = in.seek(p)
  override def tell(): Long = in.getPos
  override def length(): Long = len
  override def read(b: Array[Byte], off: Int, l: Int): Int = in.read(b, off, l)
  override def close(): Unit = in.close()
}

class AvroPartitionReader(pathStr: String, start: Long, end: Long,
    required: StructType, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val path = new Path(pathStr)
  private val reader: DataFileReader[GenericRecord] = {
    // ONE open: the DataFileReader parses the header, then the pruned
    // READER schema is installed via setExpected so avro's resolution
    // skips non-projected fields byte-wise (no second header pass; on
    // a projection error the input is closed, not leaked)
    val in = new HadoopSeekableInput(path, conf.value)
    val datumReader = new GenericDatumReader[GenericRecord]()
    // corrupt magic/header throws from the constructor itself — the
    // catch below only guards post-construction calls, so close the
    // input explicitly on construction failure (task-side fd leak)
    val r = try new DataFileReader[GenericRecord](in, datumReader)
      catch { case e: Throwable => in.close(); throw e }
    try {
      datumReader.setExpected(projectedSchema(r.getSchema))
      r.sync(start) // first block at or after start (0 -> first block)
      r
    } catch { case e: Throwable => r.close(); throw e }
  }

  /** Reader schema = writer schema filtered to the projected fields
    * (types stay the writer's — resolution must not coerce). */
  private def projectedSchema(writer: Schema): Schema = {
    require(writer.getType == Schema.Type.RECORD,
      s"graft-avro: $pathStr is not a record container: ${writer.getType}")
    val byName = writer.getFields.asScala.map(f => f.name() -> f).toMap
    val fields = required.fieldNames.map { n =>
      val f = byName.getOrElse(n, throw new IllegalArgumentException(
        s"graft-avro: field '$n' absent from $pathStr " +
          s"(file has: ${writer.getFields.asScala.map(_.name()).mkString(", ")})"))
      // a null default is only VALID when the union's first branch is
      // null (avro validates defaults against the first branch) — a
      // foreign file with [T, null] order must still read
      val nullFirst = f.schema().getType == Schema.Type.UNION &&
        f.schema().getTypes.get(0).getType == Schema.Type.NULL
      new Schema.Field(f.name(), f.schema(), null,
        if (nullFirst) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("graft_row_projected", null, "graft", false,
      java.util.List.of(fields: _*))
  }

  private val converters: Array[Any => Any] =
    required.fields.map { f =>
      f.dataType match {
        case StringType => (v: Any) => v match {
          case null => null
          case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0,
            u.getByteLength)
          case s: CharSequence => UTF8String.fromString(s.toString)
          case other => throw new IllegalStateException(
            s"graft-avro: field '${f.name}' expected string, got " +
              s"${other.getClass}")
        }
        case BinaryType => (v: Any) => v match {
          case null => null
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case other => throw new IllegalStateException(
            s"graft-avro: field '${f.name}' expected bytes, got " +
              s"${other.getClass}")
        }
        case _ => (v: Any) => v // boolean/int/long/float/double
      }
    }

  private var current: InternalRow = _
  private var record: GenericRecord = _ // reused by avro across next()

  override def next(): Boolean = {
    if (!reader.hasNext || reader.pastSync(end)) return false
    record = reader.next(record)
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < vals.length) {
      vals(i) = converters(i)(record.get(i))
      i += 1
    }
    current = new GenericInternalRow(vals)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
