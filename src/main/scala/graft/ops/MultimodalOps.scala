package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride as opaque `binary` columns next to typed metadata; the
  * Spark-side machinery — schema, batch iteration, partition sizing — is
  * real and tested. IMAGES decode for real via [[ImageIoCodec]] (the
  * JDK's `javax.imageio` PNG/JPEG/BMP/GIF readers — no native libs) and
  * AUDIO via [[AudioCodec]] (`javax.sound.sampled` WAV/PCM); VIDEO
  * container METADATA parses for real ([[extractVideoMeta]], a RIFF/AVI
  * chunk walk) and MJPEG-in-AVI frame PIXELS decode for real
  * ([[decodeVideoFrames]] — each movi chunk is a self-contained JPEG
  * the imageio path handles).
  *
  * DECLARED BOUNDARY (bundled binaries only): INTER-frame video
  * bitstreams (H.264/H.265/VP9/AV1) have no JDK decoder, and bundling
  * one means native binaries, which this library deliberately
  * excludes. The seam is [[MediaCodecFactory]], and it is now
  * EXERCISED by a real external codec: [[FfmpegCodecFactory]] decodes
  * any ffmpeg-supported bitstream through a subprocess wherever the
  * deployment ships ffmpeg/ffprobe (opt-in; tests gate on binary
  * presence, the subprocess plumbing itself is spec-covered with
  * fakes). In-repo, [[StubCodec]] supplies deterministic byte-derived
  * features behind the same seam so the plumbing stays testable with
  * no binaries at all.
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

  /** Decoded features. `width`/`height` are REAL decoded dimensions for
    * pixel-decoding codecs ([[ImageIoCodec]]); byte-level codecs that
    * never see pixels ([[StubCodec]]) leave them 0. `brightness` is mean
    * normalized intensity in [0, 1] — per-byte for the stub, Rec.601
    * luma over decoded pixels for images. */
  final case class MediaFeatures(id: Long, mediaType: String, byteLen: Long,
      checksum: Long, brightness: Double, width: Int = 0, height: Int = 0)

  /** A payload the codec cannot decode. Real decoders wrap their native
    * error here so [[CorruptPolicy]] can act on it; anything else a codec
    * throws is treated as a bug and fails the job under either policy. */
  final class CorruptPayloadException(val id: Long, msg: String,
      cause: Throwable = null)
    extends RuntimeException(s"media id=$id: $msg", cause)

  /** What [[extractFeatures]] does with a corrupt payload: fail the job
    * (exact pipelines) or drop the row (web-scale ingest, where a
    * per-mille of undecodable blobs is normal and a poison row must not
    * kill a 100 TB pass). Counted drops are the caller's join-back
    * against the output ids. */
  sealed trait CorruptPolicy extends Serializable
  object CorruptPolicy {
    case object Fail extends CorruptPolicy
    case object Skip extends CorruptPolicy
  }

  /** Per-partition decoder lifecycle. `open()` runs ONCE per partition
    * (load native libs, allocate scratch buffers); `decode` streams rows;
    * `close()` is registered on task completion — it runs even when the
    * task stops early (limit, failure), so native resources cannot leak.
    * A real JNI codec implements this trait; the pipeline shape does not
    * change. The FACTORY is what ships to executors, so it must be
    * Serializable; the decoder it opens need not be. */
  trait MediaCodecFactory extends Serializable {
    def open(): MediaDecoder
  }
  trait MediaDecoder {
    /** @throws CorruptPayloadException for undecodable payloads */
    def decode(r: MediaRow): MediaFeatures
    def close(): Unit = ()
  }

  /** STUB codec for media kinds this container has no decoder for
    * (video — ffmpeg and friends are absent, and the JDK has no video
    * decoder; IMAGES have the real [[ImageIoCodec]] and AUDIO the real
    * [[AudioCodec]]). Deterministic: features derive from bytes.
    * Contract pieces a real codec shares: a NULL payload is corrupt
    * (binary columns are nullable; a real decoder would segfault or
    * throw), features are a pure function of (id, payload, mediaType). */
  object StubCodec extends MediaCodecFactory {
    def open(): MediaDecoder = new MediaDecoder {
      def decode(r: MediaRow): MediaFeatures = StubCodec.decodeRow(r)
    }
    def decodeRow(r: MediaRow): MediaFeatures = {
      if (r.payload == null)
        throw new CorruptPayloadException(r.id, "null payload")
      val hash = byteChecksum(r.payload)
      val bright =
        if (r.payload.isEmpty) 0.0
        else r.payload.map(b => (b & 0xff).toDouble).sum / (255.0 * r.payload.length)
      MediaFeatures(r.id, r.mediaType, r.payload.length.toLong, hash, bright)
    }
    /** Back-compat convenience (pre-lifecycle callers and tests). */
    def decode(r: MediaRow): MediaFeatures = decodeRow(r)
  }

  /** The byte checksum both codecs stamp: rolling polynomial hash, mod
    * applied per step (no overflow — the same recurrence is expressible
    * in ANSI SQL for the oracle). */
  private[ops] def byteChecksum(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    h
  }

  /** REAL image codec over the JDK's built-in `javax.imageio` readers
    * (PNG/JPEG/BMP/GIF/WBMP — no native libraries): parses the actual
    * container bytes and derives features from DECODED PIXELS — decoded
    * dimensions and mean Rec.601 luma (integer 299/587/114 milli-weights
    * summed exactly in Long, one double divide at the end, so the value
    * is engine-portable for lossless formats where the oracle can replay
    * the pixel formula). Audio decodes via [[AudioCodec]]; video remains
    * honestly stubbed — no decoder in the JDK (see [[StubCodec]]).
    *
    * Corruption contract: a payload no registered reader accepts
    * (`ImageIO.read` returns null), a reader abort mid-parse (truncated
    * file), and null/empty payloads all surface as
    * [[CorruptPayloadException]] for [[CorruptPolicy]] to act on.
    *
    * Determinism caveat: checksum/byteLen are byte-level (always
    * replayable), but `brightness`/dimensions come from DECODED pixels —
    * stable across engines/JDKs only for LOSSLESS formats (PNG/BMP/GIF).
    * Lossy JPEG's IDCT output may differ by ±1 per channel across JDK
    * versions, so oracle-compared queries (and the driver fixtures) use
    * lossless payloads only. */
  object ImageIoCodec extends MediaCodecFactory {
    // ImageIO's default ImageInputStream cache is a TEMP FILE per stream
    // — per-image disk I/O that dominates small-image decode throughput.
    // In-memory payloads never need it; this is a JVM-global switch, set
    // once per executor when the codec first loads.
    javax.imageio.ImageIO.setUseCache(false)
    def open(): MediaDecoder = new MediaDecoder {
      def decode(r: MediaRow): MediaFeatures = ImageIoCodec.decodeRow(r)
    }
    def decodeRow(r: MediaRow): MediaFeatures = {
      if (r.payload == null)
        throw new CorruptPayloadException(r.id, "null payload")
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case e: java.io.IOException =>
          throw new CorruptPayloadException(r.id, s"image parse failed: ${e.getMessage}", e)
        }
      if (img == null) // no registered reader claims these bytes
        throw new CorruptPayloadException(r.id, "undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      var lumaMilli = 0L // Σ over pixels of 299·R + 587·G + 114·B (8-bit sRGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          lumaMilli += 299L * ((rgb >> 16) & 0xff) +
            587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      val brightness = lumaMilli.toDouble / (255000.0 * (w.toLong * h))
      MediaFeatures(r.id, r.mediaType, r.payload.length.toLong,
        byteChecksum(r.payload), brightness, w, h)
    }
  }

  /** REAL audio codec over the JDK's built-in `javax.sound.sampled`
    * WAV/AIFF/AU parsers (no native libraries): parses the actual
    * container bytes and derives features from DECODED PCM SAMPLES.
    * Feature mapping onto [[MediaFeatures]] (documented reuse, so the
    * whole [[extractFeatures]] pipeline applies unchanged):
    * `width` = sample rate (Hz), `height` = frame count, `brightness` =
    * mean normalized amplitude — Σ(sample + 32768) over all samples,
    * summed exactly in Long, one double divide by 65535·n at the end.
    * PCM is lossless, so every feature is an exact integer function of
    * the payload and an oracle can replay it in closed form (the
    * `multimodal_audio` query does).
    *
    * Scope: 16-bit integer PCM (signed or unsigned, either endianness,
    * any channel count) — what WAV ingest pipelines actually carry.
    * Other encodings (float PCM, u-law, 8/24-bit) surface as
    * [[CorruptPayloadException]] rather than silently mis-decoding.
    *
    * Corruption contract: bytes no parser claims
    * (`UnsupportedAudioFileException`), a data chunk shorter than the
    * header's frame count (truncation), and null/empty payloads all
    * surface as [[CorruptPayloadException]] for [[CorruptPolicy]].
    * Video remains honestly stubbed — the JDK ships no video decoder
    * (see [[StubCodec]]). */
  object AudioCodec extends MediaCodecFactory {
    def open(): MediaDecoder = new MediaDecoder {
      def decode(r: MediaRow): MediaFeatures = AudioCodec.decodeRow(r)
    }
    def decodeRow(r: MediaRow): MediaFeatures = {
      val (rate, frames, biased) = decodePcmBiased(r.id, r.payload)
      var ampSum = 0L
      var i = 0
      while (i < biased.length) { ampSum += biased(i); i += 1 }
      val amp = if (biased.length == 0) 0.0
        else ampSum.toDouble / (65535.0 * biased.length)
      MediaFeatures(r.id, r.mediaType, r.payload.length.toLong,
        byteChecksum(r.payload), amp, rate, frames)
    }
  }

  /** Decode a 16-bit PCM container to the bias-shifted sample stream
    * `sample + 32768 ∈ [0, 65535]` (channels interleaved, the stream
    * [[AudioCodec]] aggregates) plus (sampleRateHz, frameCount). One
    * decode path shared by the clip-level and window-level features, so
    * the two can never disagree on parsing. All corruption surfaces as
    * [[CorruptPayloadException]] for [[CorruptPolicy]]. */
  private[graft] def decodePcmBiased(id: Long,
      payload: Array[Byte]): (Int, Int, Array[Int]) = {
    if (payload == null)
      throw new CorruptPayloadException(id, "null payload")
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new CorruptPayloadException(id,
            s"undecodable audio payload: ${e.getMessage}", e)
        case e: java.io.IOException =>
          throw new CorruptPayloadException(id,
            s"audio parse failed: ${e.getMessage}", e)
      }
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      if (!signed && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
        throw new CorruptPayloadException(id,
          s"unsupported audio encoding: $enc")
      if (fmt.getSampleSizeInBits != 16)
        throw new CorruptPayloadException(id,
          s"unsupported sample size: ${fmt.getSampleSizeInBits} bits")
      val frames = ais.getFrameLength
      val frameSize = fmt.getFrameSize // channels × 2 bytes
      if (frames < 0 || frames * frameSize > Int.MaxValue)
        throw new CorruptPayloadException(id,
          s"unbounded or oversized frame length: $frames")
      val want = (frames * frameSize).toInt
      val data = ais.readNBytes(want)
      if (data.length < want)
        throw new CorruptPayloadException(id,
          s"truncated audio data: ${data.length} of $want bytes")
      val biased = new Array[Int](want / 2)
      var i = 0
      while (i < want) {
        val (lo, hi) = if (fmt.isBigEndian) (data(i + 1), data(i))
          else (data(i), data(i + 1))
        val raw = ((hi & 0xff) << 8) | (lo & 0xff)
        // signed → +32768 biases into [0, 65535]; unsigned is already there
        biased(i / 2) = if (signed) ((raw << 16) >> 16) + 32768 else raw
        i += 2
      }
      (math.round(fmt.getSampleRate).toInt, frames.toInt, biased)
    } finally ais.close()
  }

  /** One fixed-length analysis window of a decoded PCM clip. `meanAmp`
    * is mean bias-shifted amplitude in [0, 1]; `peakAmp` the window max
    * of the bias-shifted sample (∈ [0, 65535]); `zeroCrossings` counts
    * WITHIN-window adjacent sign changes of the signed sample (s = 0
    * counts as non-negative) — the classic cheap voiced/unvoiced and
    * silence cues. */
  final case class AudioWindow(id: Long, winIdx: Int, winN: Long,
      meanAmp: Double, peakAmp: Long, zeroCrossings: Long)

  /** Fixed-size windowed PCM features — the per-segment stats an audio
    * curation pass filters on (silence trim, clipping detection, speech
    * activity) where one clip-level mean hides everything local.
    *
    * Scale shape: identical to [[extractFeatures]] — decode runs in
    * `mapPartitions`, blobs never shuffle, and each clip emits only
    * ceil(n / windowSamples) small scalar rows. Window stats are exact
    * integer sums over the decoded stream; crossings are counted within
    * windows only (no cross-window state), so every window is
    * independently recomputable — what makes the closed-form oracle and
    * any downstream incremental re-windowing possible. */
  def audioWindowFeatures(media: Dataset[MediaRow], windowSamples: Int,
      onCorrupt: CorruptPolicy = CorruptPolicy.Fail)
      (implicit spark: SparkSession): Dataset[AudioWindow] = {
    require(windowSamples >= 2,
      s"windowSamples must be >= 2 (crossings need a pair), got $windowSamples")
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val decoded =
          try Some(decodePcmBiased(r.id, r.payload))
          catch {
            case e: CorruptPayloadException => onCorrupt match {
              case CorruptPolicy.Fail => throw e
              case CorruptPolicy.Skip => None
            }
          }
        decoded.iterator.flatMap { case (_, _, biased) =>
          (0 until (biased.length + windowSamples - 1) / windowSamples)
            .iterator.map { w =>
              val start = w * windowSamples
              val end = math.min(start + windowSamples, biased.length)
              var sum = 0L; var peak = 0L; var zc = 0L
              var i = start
              while (i < end) {
                val b = biased(i)
                sum += b
                if (b > peak) peak = b
                if (i > start && ((biased(i - 1) < 32768) != (b < 32768)))
                  zc += 1
                i += 1
              }
              val n = end - start
              // exact integer sum ÷ one double divide; 6dp rounding is the
              // QUERY's job (same operation order as the oracle)
              AudioWindow(r.id, w, n.toLong,
                sum.toDouble / (65535.0 * n), peak, zc)
            }
        }
      }
    }
  }

  /** Deterministic synthetic mono 16-bit signed PCM WAV: sample `i` of
    * clip `id` is `((7·id + 13·i) mod 65536) − 32768`, frame count
    * `200 + id mod 57`, 8 kHz — PCM round-trips exactly, so an oracle
    * recomputes [[AudioCodec]]'s amplitude sum from the formula alone
    * (the unsigned bias cancels: sample + 32768 = (7·id + 13·i) mod
    * 65536). Encoded through `javax.sound.sampled.AudioSystem.write`,
    * so decode exercises the real container parser. */
  def syntheticWav(id: Long): Array[Byte] = {
    require(id >= 0, s"id must be non-negative (JVM % differs from SQL on " +
      s"negatives), got $id")
    val n = (200 + id % 57).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((7 * id + 13 * i) % 65536).toInt - 32768
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic truecolor PNG: pixel (x, y) of image `id`
    * is the closed-form RGB below — PNG is lossless, so a decode
    * round-trips these exact channel values and an oracle can recompute
    * [[ImageIoCodec]]'s luma sum from the formula alone (the per-channel
    * twin lives in the `multimodal_decode` oracle SQL). */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "image dimensions must be positive")
    require(id >= 0, s"id must be non-negative (JVM % differs from SQL on " +
      s"negatives), got $id")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((7 * id + 13 * x + 31 * y) % 256).toInt
        val g = ((11 * id + 17 * x + 5 * y + 101) % 256).toInt
        val b = ((3 * id + 29 * x + 19 * y + 203) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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

  /** Feature extraction: one codec instance per partition (opened lazily,
    * closed on task completion), streamed rows (no per-row init, no
    * full-partition materialization), corrupt payloads handled per
    * `onCorrupt`. */
  def extractFeatures(media: Dataset[MediaRow],
      codec: MediaCodecFactory = StubCodec,
      onCorrupt: CorruptPolicy = CorruptPolicy.Fail)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val dec = codec.open()
      // close even on early task exit (limit/failure); null TaskContext =
      // driver-local iteration in tests
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      it.flatMap { r =>
        try Some(dec.decode(r))
        catch {
          case e: CorruptPayloadException => onCorrupt match {
            case CorruptPolicy.Fail => throw e
            case CorruptPolicy.Skip => None
          }
        }
      }
    }
  }

  /** Parsed video-container metadata (no pixel decode — see
    * [[extractVideoMeta]]). `usecPerFrame` is the container's exact
    * integer frame interval (fps = 1e6 / usecPerFrame). */
  final case class VideoMeta(id: Long, width: Int, height: Int,
    nFrames: Long, usecPerFrame: Long, byteLen: Long, checksum: Long)

  /** REAL video CONTAINER parsing: walk the RIFF/AVI chunk tree
    * (Microsoft's public AVI RIFF form) to the `avih` MainAVIHeader and
    * read dimensions, total frames, and the exact per-frame interval —
    * the metadata a pipeline needs for frame-sampling plans, duration
    * filters, and resolution buckets, extracted WITHOUT any frame
    * decode. Frame PIXEL decode remains honestly stubbed
    * ([[StubCodec]]): the JDK ships container parsers for images/audio
    * but no video bitstream decoder, and this container has no ffmpeg.
    * This closes the metadata half for real: the parser reads actual
    * container bytes (chunk walk, not fixed offsets), and the
    * corruption contract matches the other codecs — bad magic,
    * truncation mid-chunk, and a missing `avih` all surface as
    * [[CorruptPayloadException]].
    *
    * Scale shape: identical to [[extractFeatures]] — mapPartitions,
    * header-only reads (the first KB of each blob), blobs never
    * shuffle; only the 7-scalar meta rows move. */
  def extractVideoMeta(media: Dataset[MediaRow],
      onCorrupt: CorruptPolicy = CorruptPolicy.Fail)
      (implicit spark: SparkSession): Dataset[VideoMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try Some(parseAviMeta(r.id, r.payload, r.mediaType))
        catch {
          case e: CorruptPayloadException => onCorrupt match {
            case CorruptPolicy.Fail => throw e
            case CorruptPolicy.Skip => None
          }
        }
      }
    }
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** RIFF/AVI chunk walk to the MainAVIHeader. Public layout: `RIFF`
    * size `AVI ` then chunks; `LIST` chunks carry a 4-byte form type
    * then sub-chunks; `avih` holds 14 little-endian u32s starting with
    * dwMicroSecPerFrame; dwTotalFrames/dwWidth/dwHeight at u32 offsets
    * 4/8/9. */
  private[graft] def parseAviMeta(id: Long, payload: Array[Byte],
      mediaType: String): VideoMeta = {
    if (payload == null)
      throw new CorruptPayloadException(id, "null payload")
    if (payload.length < 24)
      throw new CorruptPayloadException(id,
        s"payload too short for a RIFF header: ${payload.length} bytes")
    if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ")
      throw new CorruptPayloadException(id,
        s"not a RIFF/AVI container: ${fourcc(payload, 0)}/${fourcc(payload, 8)}")
    val riffEnd = math.min(payload.length.toLong, 8L + u32le(payload, 4))
    // walk top-level chunks; descend into LIST/hdrl for avih
    def findAvih(pos0: Long, end: Long): Option[Int] = {
      var pos = pos0
      while (pos + 8 <= end) {
        val cc = fourcc(payload, pos.toInt)
        val sz = u32le(payload, pos.toInt + 4)
        if (pos + 8 + sz > payload.length)
          throw new CorruptPayloadException(id,
            s"truncated chunk $cc at $pos: declares $sz bytes")
        if (cc == "LIST" && sz >= 4 &&
            fourcc(payload, pos.toInt + 8) == "hdrl") {
          val r = findAvih(pos + 12, pos + 8 + sz)
          if (r.isDefined) return r
        } else if (cc == "avih") {
          if (sz < 56)
            throw new CorruptPayloadException(id,
              s"avih chunk too small: $sz bytes")
          return Some(pos.toInt + 8)
        }
        pos += 8 + sz + (sz & 1L) // chunks are word-aligned
      }
      None
    }
    val at = findAvih(12L, riffEnd).getOrElse(
      throw new CorruptPayloadException(id, "no avih header in container"))
    VideoMeta(id,
      width = u32le(payload, at + 32).toInt,
      height = u32le(payload, at + 36).toInt,
      nFrames = u32le(payload, at + 16),
      usecPerFrame = u32le(payload, at),
      byteLen = payload.length.toLong,
      checksum = byteChecksum(payload))
  }

  /** Deterministic synthetic AVI container: a well-formed RIFF tree
    * (hdrl LIST with a 56-byte avih + a movi LIST with one `00dc`
    * chunk of 2·(id mod 32) filler bytes). Every header field is a
    * closed form of `id`, so the oracle replays
    * [[extractVideoMeta]] without touching bytes:
    * width = 160 + (id%8)·16, height = 120 + (id%5)·24,
    * frames = 30 + id%91, usecPerFrame = 20000 + (id%7)·5000,
    * byteLen = [[syntheticAviBaseLen]] + 2·(id%32). */
  def syntheticAvi(id: Long): Array[Byte] = {
    require(id >= 0, s"id must be non-negative, got $id")
    val width = (160 + (id % 8) * 16).toInt
    val height = (120 + (id % 5) * 24).toInt
    val frames = (30 + id % 91).toInt
    val uspf = (20000 + (id % 7) * 5000).toInt
    val jlen = (2 * (id % 32)).toInt
    val bb = java.nio.ByteBuffer.allocate(108 + jlen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); bb.putInt(100 + jlen); cc("AVI ")
    cc("LIST"); bb.putInt(68); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(uspf); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(frames); bb.putInt(0); bb.putInt(1); bb.putInt(0)
    bb.putInt(width); bb.putInt(height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    cc("LIST"); bb.putInt(12 + jlen); cc("movi")
    cc("00dc"); bb.putInt(jlen)
    bb.put(new Array[Byte](jlen))
    bb.array()
  }

  /** byteLen of [[syntheticAvi]] at zero filler — derived, not
    * hardcoded, so the oracle constant cannot drift from the
    * generator. */
  lazy val syntheticAviBaseLen: Int = syntheticAvi(0L).length

  /** One sampled frame of a media payload. */
  final case class FrameRow(id: Long, frameIdx: Int, payload: Array[Byte])

  /** Per-frame decoded features ([[decodeVideoFrames]]). */
  final case class FrameFeatures(id: Long, frameIdx: Long, width: Int,
    height: Int, brightness: Double, frameBytes: Long)

  /** REAL video FRAME decode for the MJPEG-in-AVI codec family: every
    * `00dc`/`00db` chunk in the `movi` LIST is one self-contained JPEG,
    * which the same `javax.imageio` path as [[ImageIoCodec]] decodes —
    * closing the frame-pixel half of video for the one codec family the
    * JDK can handle end to end. INTER-frame codecs (H.264 etc.) remain
    * the honest stub: their chunks are not independently decodable and
    * the JDK ships no bitstream decoder — such payloads surface as
    * [[CorruptPayloadException]] ("undecodable frame"), never a silent
    * skip.
    *
    * Features per frame: decoded dimensions + the exact Rec.601
    * milli-weight luma mean (the [[ImageIoCodec]] formula — engine-
    * portable for DC-exact fixtures, see [[syntheticMjpegAvi]]).
    *
    * Scale shape: mapPartitions, one container resident per task at a
    * time, frames decoded streaming within it; only fixed-width feature
    * rows leave the partition. */
  def decodeVideoFrames(media: Dataset[MediaRow],
      onCorrupt: CorruptPolicy = CorruptPolicy.Fail)
      (implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try decodeMjpegFrames(r.id, r.payload)
        catch {
          case e: CorruptPayloadException => onCorrupt match {
            case CorruptPolicy.Fail => throw e
            case CorruptPolicy.Skip => Seq.empty
          }
        }
      }
    }
  }

  private[graft] def decodeMjpegFrames(id: Long,
      payload: Array[Byte]): Seq[FrameFeatures] = {
    // container validation identical to the metadata walk
    parseAviMeta(id, payload, "video/avi")
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walkMovi(pos0: Long, end: Long): Unit = {
      var pos = pos0
      while (pos + 8 <= end) {
        val cc = fourcc(payload, pos.toInt)
        val sz = u32le(payload, pos.toInt + 4)
        if (pos + 8 + sz > payload.length)
          throw new CorruptPayloadException(id,
            s"truncated chunk $cc at $pos: declares $sz bytes")
        if (cc == "LIST" && sz >= 4) {
          val form = fourcc(payload, pos.toInt + 8)
          // frames live in movi; interleaved files nest them in 'rec '
          if (form == "movi" || form == "rec ")
            walkMovi(pos + 12, pos + 8 + sz)
        } else if (cc.endsWith("dc") || cc.endsWith("db")) {
          frames += ((pos.toInt + 8, sz.toInt))
        }
        pos += 8 + sz + (sz & 1L)
      }
    }
    walkMovi(12L, math.min(payload.length.toLong, 8L + u32le(payload, 4)))
    frames.zipWithIndex.map { case ((off, len), k) =>
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, off, len))
        catch { case e: java.io.IOException =>
          throw new CorruptPayloadException(id,
            s"frame $k parse failed: ${e.getMessage}", e)
        }
      if (img == null)
        throw new CorruptPayloadException(id,
          s"undecodable frame $k (only MJPEG — per-frame JPEG/DIB — is " +
            "supported; inter-frame codecs remain stubbed)")
      val w = img.getWidth
      val h = img.getHeight
      var lumaMilli = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          lumaMilli += 299L * ((rgb >> 16) & 0xff) +
            587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      FrameFeatures(id, k.toLong, w, h,
        lumaMilli.toDouble / (255000.0 * (w.toLong * h)), len.toLong)
    }.toSeq
  }

  /** Deterministic synthetic MJPEG-in-AVI: the [[syntheticAvi]] RIFF
    * tree with REAL JPEG frames — each `00dc` chunk is a uniform-gray
    * JPEG whose value is a closed form of (id, frame):
    * v = (id·7 + k·31) mod 256, w = 32 + (id mod 4)·8,
    * h = 24 + (id mod 3)·8, frames = 2 + id mod 3. (Dims are kept
    * small: the fixture's JPEG ENCODE is bench-visible cost that is
    * generator overhead, not operator work.)
    *
    * Uniform gray is the DC-EXACT fixture class: every 8×8 block is
    * constant, so the JPEG pipeline is DC-only and decode returns v
    * exactly (round-trip identity verified for ALL v in
    * MultimodalSpec) — which is what lets the oracle state
    * brightness = v/255 in closed form without a JPEG decoder. */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    require(id >= 0, s"id must be non-negative, got $id")
    val width = (32 + (id % 4) * 8).toInt
    val height = (24 + (id % 3) * 8).toInt
    val nFrames = (2 + id % 3).toInt
    val jpegs = (0 until nFrames).map { k =>
      val v = ((id * 7 + k * 31) % 256).toInt
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (v << 16) | (v << 8) | v
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val moviSz = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val riffSz = 4 + (8 + 68) + (8 + moviSz)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSz)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    cc("RIFF"); bb.putInt(riffSz); cc("AVI ")
    cc("LIST"); bb.putInt(68); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(33333); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(nFrames); bb.putInt(0); bb.putInt(1); bb.putInt(0)
    bb.putInt(width); bb.putInt(height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    cc("LIST"); bb.putInt(moviSz); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); bb.putInt(j.length); bb.put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** REAL image resize (images only — video/audio keep the [[resize]]
    * stub): decode via the same `javax.imageio` path as [[ImageIoCodec]],
    * NEAREST-NEIGHBOR resample — out(x, y) = in(x·W div w, y·H div h),
    * integer arithmetic, no smoothing kernel, so the pixel selection is
    * deterministic and an oracle can replay it in closed form — then
    * re-encode as lossless PNG. Corrupt payloads follow `onCorrupt`
    * ([[CorruptPolicy.Skip]] drops the row). Blobs stay inside the
    * partition: decode, resample, re-encode are one narrow pass. */
  def imageResize(media: Dataset[MediaRow], w: Int, h: Int,
      onCorrupt: CorruptPolicy = CorruptPolicy.Fail)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    require(w > 0 && h > 0, "target dimensions must be positive")
    media.mapPartitions(_.flatMap { r =>
      try {
        if (r.payload == null)
          throw new CorruptPayloadException(r.id, "null payload")
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case e: java.io.IOException =>
            throw new CorruptPayloadException(r.id, s"image parse failed: ${e.getMessage}", e)
          }
        if (img == null)
          throw new CorruptPayloadException(r.id, "undecodable image payload")
        val (iw, ih) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB(x * iw / w, y * ih / h))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(r.copy(payload = bos.toByteArray, width = w, height = h))
      } catch {
        case e: CorruptPayloadException => onCorrupt match {
          case CorruptPolicy.Fail => throw e
          case CorruptPolicy.Skip => None
        }
      }
    })
  }

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

  /** Per-image difference hash ([[imageDHash]]). */
  final case class ImageHash(id: Long, width: Int, height: Int, dhash: Long)

  /** Perceptual difference hash (dHash) over DECODED pixels: the image
    * is nearest-neighbor-sampled onto a `gridW × gridH` luma grid
    * (source pixel `(gx·w/gw, gy·h/gh)`, integer division — for a
    * grid-sized input this is the identity, keeping the fixture oracle
    * closed-form), and each grid row contributes `gridW - 1`
    * adjacent-comparison bits (`luma(x+1) > luma(x)`), packed
    * little-endian into one BIGINT. Luma is the exact Rec.601 integer
    * milli-weight sum (299R + 587G + 114B) — monotone in luminance, no
    * divisions, so the bit pattern is an exact integer function of the
    * pixels and a relational oracle can replay it.
    *
    * Near-dup detection then reduces to hamming distance on 8-byte
    * keys — the SimHash banding machinery in
    * [[graft.ops.DedupOps.simhashNearDupPairsFromFp]] applies verbatim
    * (rename `dhash` → `simhash`): at 100 TB, images never pairwise
    * compare; only 8-byte hashes shuffle through the band equi-join.
    *
    * Default grid 9×8 = 64 bits, the published dHash shape;
    * `gridH · (gridW - 1)` must fit 64 bits. */
  def imageDHash(media: Dataset[MediaRow], gridW: Int = 9, gridH: Int = 8,
      onCorrupt: CorruptPolicy = CorruptPolicy.Fail)
      (implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    require(gridW >= 2 && gridH >= 1, "grid must be at least 2x1")
    require(gridH * (gridW - 1) <= 64,
      s"dhash bits ${gridH * (gridW - 1)} exceed one BIGINT (grid " +
        s"$gridW x $gridH)")
    media.mapPartitions(_.flatMap { r =>
      try Some(dhashRow(r, gridW, gridH))
      catch {
        case e: CorruptPayloadException => onCorrupt match {
          case CorruptPolicy.Fail => throw e
          case CorruptPolicy.Skip => None
        }
      }
    })
  }

  private[graft] def dhashRow(r: MediaRow, gw: Int, gh: Int): ImageHash = {
    if (r.payload == null)
      throw new CorruptPayloadException(r.id, "null payload")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      catch { case e: java.io.IOException =>
        throw new CorruptPayloadException(r.id,
          s"image parse failed: ${e.getMessage}", e)
      }
    if (img == null)
      throw new CorruptPayloadException(r.id, "undecodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    if (w < gw)
      throw new CorruptPayloadException(r.id,
        s"image narrower ($w) than hash grid ($gw): sampling would repeat " +
          "columns and zero the difference bits")
    def luma(x: Int, y: Int): Long = {
      val rgb = img.getRGB(x, y)
      299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)
    }
    var hash = 0L
    var gy = 0
    var k = 0
    while (gy < gh) {
      val sy = (gy * h) / gh
      var gx = 0
      var prev = luma((0 * w) / gw, sy)
      while (gx < gw - 1) {
        val cur = luma(((gx + 1) * w) / gw, sy)
        if (cur > prev) hash |= (1L << k)
        prev = cur
        k += 1
        gx += 1
      }
      gy += 1
    }
    ImageHash(r.id, w, h, hash)
  }
}
