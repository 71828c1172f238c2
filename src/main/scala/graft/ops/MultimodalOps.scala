package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride as opaque `binary` columns next to typed metadata; the
  * Spark-side machinery — schema, batch iteration, partition sizing — is
  * real and tested, while the codec itself is STUBBED (this container has
  * no image/audio libraries): [[StubCodec.decode]] derives deterministic
  * fake features from the bytes. Swap `StubCodec` for a real JNI/library
  * codec without touching the pipeline shape.
  *
  * Scale notes: decode runs in `mapPartitions` (one codec init per
  * partition, not per row); blobs never shuffle — features are extracted
  * first and only the small feature rows move; `repartitionByBytes` keeps
  * per-task memory bounded when blob sizes are skewed.
  */
object MultimodalOps {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(id: Long, payload: Array[Byte], mediaType: String,
      width: Int, height: Int)

  /** Deterministic fake features standing in for a real decoder. */
  final case class MediaFeatures(id: Long, mediaType: String, byteLen: Long,
      checksum: Long, brightness: Double)

  /** STUB codec — replace with a real decoder (libjpeg/ffmpeg/...) in a
    * container that has one. Deterministic: features derive from bytes. */
  object StubCodec {
    def decode(r: MediaRow): MediaFeatures = {
      // rolling polynomial hash, mod applied per step (no overflow — the
      // same recurrence is expressible in ANSI SQL for the oracle)
      var h = 0L
      var i = 0
      while (i < r.payload.length) {
        h = (h * 31 + (r.payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      val hash = h
      val bright =
        if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / (255.0 * r.payload.length)
      MediaFeatures(r.id, r.mediaType, r.payload.length.toLong, hash, bright)
    }
  }

  /** Wrap any table with a binary payload column into the media schema. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("payload"),
        lit(mediaType).as("mediaType"), lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
  }

  /** Feature extraction: one codec instance per partition, streamed rows
    * (no per-row init, no full-partition materialization). */
  def extractFeatures(media: Dataset[MediaRow])
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it => it.map(StubCodec.decode) }
  }

  /** One sampled frame of a media payload. */
  final case class FrameRow(id: Long, frameIdx: Int, payload: Array[Byte])

  /** STUB resize: deterministic byte decimation standing in for a real
    * scaler — keeps a stride-sampled prefix of ~w·h bytes and stamps the
    * target dimensions. The pipeline shape (per-partition map, metadata
    * update, payload replacement) is what a real scaler plugs into. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    require(w > 0 && h > 0, "target dimensions must be positive")
    // w·h in Int silently overflows past 2^31 (empty payloads, stamped
    // dimensions, no error) — refuse loudly instead
    require(w.toLong * h <= Int.MaxValue, s"target $w x $h overflows Int")
    media.mapPartitions(_.map { r =>
      val target = w * h
      val stride = math.max(1, r.payload.length / math.max(1, target))
      val out = r.payload.indices.by(stride).take(target)
        .map(r.payload).toArray
      r.copy(payload = out, width = w, height = h)
    })
  }

  /** STUB frame sampling: treat the payload as consecutive `frameSize`-byte
    * frames and emit every `everyN`-th one. flatMap over a lazy iterator —
    * a long video never materializes all its frames at once, and the
    * (small) sampled frames are what move downstream, not the blob. */
  def frameSample(media: Dataset[MediaRow], frameSize: Int, everyN: Int)
      (implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    require(frameSize > 0 && everyN > 0)
    media.mapPartitions(_.flatMap { r =>
      val n = r.payload.length / frameSize
      Iterator.range(0, n, everyN).map { f =>
        FrameRow(r.id, f,
          java.util.Arrays.copyOfRange(r.payload, f * frameSize, (f + 1) * frameSize))
      }
    })
  }

  /** Re-partition so each task sees ~targetBytes of payload — the knob that
    * keeps a 100 TB blob table from OOMing fixed-row-count tasks. */
  def repartitionByBytes(media: Dataset[MediaRow], targetBytes: Long,
      totalBytesHint: Long): Dataset[MediaRow] = {
    require(targetBytes > 0, "targetBytes must be positive")
    // clamp in the Long domain BEFORE toInt: 100 TB / 1 KiB overflows Int
    // and would silently collapse to one partition
    val parts = math.min(totalBytesHint / targetBytes, Int.MaxValue.toLong)
    media.repartition(math.max(1L, parts).toInt, col("id"))
  }
}
