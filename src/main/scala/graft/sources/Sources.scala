package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source adapters. The reference ingests four collection kinds
  * (dask Array/Series/DataFrame/awkward — `core.py:1008-1095`); in Spark
  * they all collapse to the DataFrame, so this package is about *formats*
  * and their quirks, batch and streaming alike.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true")
      .csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC read — the second columnar format real lakes hold (Hive-era
    * tables are overwhelmingly ORC). Spark's native vectorized ORC
    * reader gives the same predicate-pushdown / column-pruning / footer
    * min-max pruning economics as parquet; the driver query
    * `source_orc_roundtrip` certifies write→read losslessness by
    * hash-matching an ORC mirror of `documents` against the parquet
    * oracle, and BucketingSpec asserts filters reach the ORC scan. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Avro container read — the native block-splittable DataSource V2
    * source built on avro-core ([[graft.sources.avro.AvroSource]]; no
    * spark-avro module needed). Schema comes from the first file's
    * embedded writer schema (one header read, no data pass); pass
    * `.schema(...)` upstream to skip even that. */
  def avro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-avro").load(path)

  /** Avro container write (one file per non-empty partition). `mode`:
    * "error" (default — refuse a directory that already holds
    * containers) or "overwrite" (write-then-swap after job success). */
  def writeAvro(df: DataFrame, path: String, codec: String = "null",
      mode: String = "error"): Unit =
    graft.sources.avro.AvroSource.write(df, path, codec, mode)

  /** Events table, normalized to a microsecond TIMESTAMP `ts` whatever
    * physical type the generator wrote:
    *
    *  - TIMESTAMP(NANOS) parquet is unreadable by Spark 4's vectorized
    *    reader without the nanosAsLong legacy conf — with it the column
    *    arrives as LongType nanos and is divided down exactly;
    *  - TIMESTAMP/TIMESTAMP_NTZ columns pass through (NTZ is cast to the
    *    session-zone type; sessions here pin UTC, so the wall-clock is
    *    unchanged and window/bucket arithmetic agrees with the oracle).
    *
    * SESSION-WIDE EFFECT (documented contract): `nanosAsLong` exists only
    * as a SQL conf — ParquetOptions accepts no per-read equivalent — and
    * the scan that consumes it runs lazily, so the conf cannot safely be
    * restored after this call returns. It is set only if currently unset,
    * and every nanos-timestamp parquet read in the session thereafter maps
    * TIMESTAMP(NANOS) to LongType (which is also the only reading Spark 4
    * supports at all). */
  def eventsWithTimestamp(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // only if not EXPLICITLY set: a user-written `false` is respected (the
    // read then fails loudly — the user's declared preference), never
    // overridden. getAll holds explicit entries only; getOption would also
    // see the registered default ("false") and make this guard a no-op.
    if (!spark.conf.getAll.contains(key)) spark.conf.set(key, "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** WARC (ISO 28500 / CommonCrawl) ingestion via the native
    * [[graft.sources.warc.WarcDataSource]] DataSource V2 — one task per
    * file, streaming bounded-memory record reads, payload-pruning scans.
    * See the source scaladoc for the full contract. */
  def warc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)

  /** Streaming reader with an explicit schema (streaming sources cannot
    * infer), plus watermark. */
  def parquetStream(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      watermarkCol: String = "", delay: String = "10 minutes"): DataFrame = {
    val base = spark.readStream.schema(schema).parquet(path)
    if (watermarkCol.isEmpty) base else base.withWatermark(watermarkCol, delay)
  }
}
