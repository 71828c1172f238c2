package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps._

/** Counting codec shared by the lifecycle tests: local-mode executors
  * share the JVM, so JVM-static counters observe executor-side calls.
  * Top-level object so the closure serializer ships a stable reference. */
object CountingCodec extends MediaCodecFactory {
  val opens = new java.util.concurrent.atomic.AtomicInteger
  val closes = new java.util.concurrent.atomic.AtomicInteger
  val decodes = new java.util.concurrent.atomic.AtomicInteger
  def reset(): Unit = { opens.set(0); closes.set(0); decodes.set(0) }
  def open(): MediaDecoder = {
    opens.incrementAndGet()
    new MediaDecoder {
      def decode(r: MediaRow): MediaFeatures = {
        decodes.incrementAndGet(); StubCodec.decodeRow(r)
      }
      override def close(): Unit = { closes.incrementAndGet() }
    }
  }
}

/** Codec-interface hardening: the contract a REAL decoder drops into —
  * golden-byte decode fixtures, corrupt-payload policy, one-init-per-
  * partition lifecycle with guaranteed close. The multimodal pipeline
  * shape must not change when StubCodec is replaced. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._
  implicit lazy val s: SparkSession = spark

  private def row(id: Long, bytes: Array[Byte]) =
    MediaRow(id, bytes, "application/octet-stream", 0, 0)

  test("golden-byte decode fixtures pin the stub contract") {
    // empty payload: zero checksum, zero brightness, zero length
    assert(StubCodec.decodeRow(row(1L, Array.empty)) ==
      MediaFeatures(1L, "application/octet-stream", 0L, 0L, 0.0))
    // [1,2,3]: rolling hash ((1*31+2)*31+3) = 1026; brightness 6/765
    assert(StubCodec.decodeRow(row(2L, Array[Byte](1, 2, 3))) ==
      MediaFeatures(2L, "application/octet-stream", 3L, 1026L, 6.0 / 765.0))
    // sign handling: 0xFF must read as 255, not -1
    assert(StubCodec.decodeRow(row(3L, Array[Byte](-1))) ==
      MediaFeatures(3L, "application/octet-stream", 1L, 255L, 1.0))
    // mod discipline: 200 x 0xFF stays within the modulus and positive
    val big = StubCodec.decodeRow(row(4L, Array.fill[Byte](200)(-1)))
    assert(big.checksum >= 0 && big.checksum < 1000000007L)
    assert(big.brightness == 1.0)
  }

  test("null payload is corrupt: Fail raises, Skip drops the row") {
    val media = MultimodalOps.asMedia(
      Seq((1L, "ok"), (2L, null)).toDF("doc_id", "text"),
      "doc_id", "text", "text/plain")
    val e = intercept[Exception] {
      MultimodalOps.extractFeatures(media,
        onCorrupt = CorruptPolicy.Fail).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[CorruptPayloadException]),
      s"expected CorruptPayloadException in cause chain of $e")
    val kept = MultimodalOps.extractFeatures(media,
      onCorrupt = CorruptPolicy.Skip).collect()
    assert(kept.map(_.id).toSeq == Seq(1L))
    // a corrupt row must not poison its neighbors' features
    assert(kept.head.byteLen == 2L)
  }

  test("ImageIoCodec decodes real PNG pixels: dimensions + Rec.601 luma") {
    // decode round-trips the lossless synthetic formula exactly
    val png = MultimodalOps.syntheticPng(5L, 8, 8)
    // a real PNG container: magic bytes present
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte))
    val f = ImageIoCodec.decodeRow(MediaRow(5L, png, "image/png", 0, 0))
    assert(f.width == 8 && f.height == 8)
    assert(f.byteLen == png.length.toLong)
    // closed-form expected luma from the generating formula
    var lumaMilli = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      lumaMilli += 299L * ((7 * 5 + 13 * x + 31 * y) % 256) +
        587L * ((11 * 5 + 17 * x + 5 * y + 101) % 256) +
        114L * ((3 * 5 + 29 * x + 19 * y + 203) % 256)
    }
    assert(f.brightness == lumaMilli.toDouble / (255000.0 * 64))
    // a 1x1 all-white PNG: brightness exactly 1
    val white = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    white.setRGB(0, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(white, "png", bos)
    val wf = ImageIoCodec.decodeRow(MediaRow(9L, bos.toByteArray, "image/png", 0, 0))
    assert(wf.width == 1 && wf.height == 1 && wf.brightness == 1.0)
  }

  test("ImageIoCodec corrupt contract: non-image, truncated, null payloads") {
    def decodeOf(bytes: Array[Byte]) =
      intercept[CorruptPayloadException](
        ImageIoCodec.decodeRow(MediaRow(7L, bytes, "image/png", 0, 0)))
    // bytes no registered reader claims
    decodeOf("definitely not an image".getBytes("UTF-8"))
    // a TRULY corrupt image: valid PNG magic, body chopped mid-stream
    val png = MultimodalOps.syntheticPng(1L, 16, 16)
    decodeOf(png.take(24))
    decodeOf(null)
    // and the pipeline-level policy still applies over real image bytes
    val rows = Seq(
      MediaRow(1L, MultimodalOps.syntheticPng(1L, 4, 4), "image/png", 0, 0),
      MediaRow(2L, png.take(24), "image/png", 0, 0))
    val kept = MultimodalOps.extractFeatures(rows.toDS(),
      codec = ImageIoCodec, onCorrupt = CorruptPolicy.Skip).collect()
    assert(kept.map(_.id).toSeq == Seq(1L))
    assert(kept.head.width == 4 && kept.head.height == 4)
    intercept[Exception](MultimodalOps.extractFeatures(rows.toDS(),
      codec = ImageIoCodec, onCorrupt = CorruptPolicy.Fail).collect())
  }

  test("AudioCodec decodes real WAV PCM: rate, frames, exact amplitude") {
    val wav = MultimodalOps.syntheticWav(5L)
    // a real RIFF/WAVE container: magic bytes present
    assert(wav.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
    assert(wav.slice(8, 12).toSeq == "WAVE".getBytes("US-ASCII").toSeq)
    val f = AudioCodec.decodeRow(MediaRow(5L, wav, "audio/wav", 0, 0))
    val n = (200 + 5 % 57).toInt
    assert(f.width == 8000 && f.height == n)
    assert(f.byteLen == wav.length.toLong)
    // closed-form expected amplitude from the generating formula: the
    // signed sample + 32768 bias cancels back to the raw mod value
    var ampSum = 0L
    for (i <- 0 until n) ampSum += (7 * 5 + 13 * i) % 65536
    assert(f.brightness == ampSum.toDouble / (65535.0 * n))
    // endianness / sign regression pins: a constant-sample WAV decodes
    // to exactly that level (0 → bias 32768 → ~0.5)
    def constWav(sample: Int, frames: Int): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        pcm(2 * i) = (sample & 0xff).toByte
        pcm(2 * i + 1) = ((sample >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mid = AudioCodec.decodeRow(MediaRow(1L, constWav(0, 10), "audio/wav", 0, 0))
    assert(mid.brightness == 32768.0 / 65535.0)
    val max = AudioCodec.decodeRow(MediaRow(2L, constWav(32767, 10), "audio/wav", 0, 0))
    assert(max.brightness == 1.0)
    val min = AudioCodec.decodeRow(MediaRow(3L, constWav(-32768, 10), "audio/wav", 0, 0))
    assert(min.brightness == 0.0)
  }

  test("AudioCodec corrupt contract: non-audio, truncated, null payloads") {
    def decodeOf(bytes: Array[Byte]) =
      intercept[CorruptPayloadException](
        AudioCodec.decodeRow(MediaRow(7L, bytes, "audio/wav", 0, 0)))
    // bytes no parser claims
    decodeOf("definitely not audio".getBytes("UTF-8"))
    // a TRULY corrupt WAV: valid header, data chunk chopped mid-stream
    val wav = MultimodalOps.syntheticWav(1L)
    decodeOf(wav.take(60))
    decodeOf(null)
    decodeOf(Array.empty[Byte])
    // and the pipeline-level policy still applies over real audio bytes
    val rows = Seq(
      MediaRow(1L, MultimodalOps.syntheticWav(1L), "audio/wav", 0, 0),
      MediaRow(2L, wav.take(60), "audio/wav", 0, 0))
    val kept = MultimodalOps.extractFeatures(rows.toDS(),
      codec = AudioCodec, onCorrupt = CorruptPolicy.Skip).collect()
    assert(kept.map(_.id).toSeq == Seq(1L))
    assert(kept.head.width == 8000)
    intercept[Exception](MultimodalOps.extractFeatures(rows.toDS(),
      codec = AudioCodec, onCorrupt = CorruptPolicy.Fail).collect())
  }

  test("audioWindowFeatures: per-window closed form, partial tail, policy") {
    val id = 5L
    val wav = MultimodalOps.syntheticWav(id)
    val n = (200 + id % 57).toInt // 205 samples → 64, 64, 64, 13
    val wins = MultimodalOps.audioWindowFeatures(
      Seq(MediaRow(id, wav, "audio/wav", 0, 0)).toDS(), windowSamples = 64)
      .collect().sortBy(_.winIdx)
    assert(wins.map(_.winIdx).toSeq == wins.indices.toSeq)
    assert(wins.map(_.winN).sum == n.toLong)
    assert(wins.last.winN == (n % 64).toLong) // the partial tail window
    // every window matches the generating formula exactly (PCM lossless)
    val biased = (0 until n).map(i => ((7 * id + 13 * i) % 65536).toInt)
    wins.foreach { w =>
      val seg = biased.slice(w.winIdx * 64, math.min((w.winIdx + 1) * 64, n))
      assert(w.meanAmp == seg.map(_.toLong).sum.toDouble / (65535.0 * seg.size))
      assert(w.peakAmp == seg.max.toLong)
      val zc = seg.sliding(2).count(p =>
        p.size == 2 && ((p(0) < 32768) != (p(1) < 32768)))
      assert(w.zeroCrossings == zc.toLong, s"win ${w.winIdx}")
    }
    // the shared decode path keeps clip-level and window-level consistent
    val clip = AudioCodec.decodeRow(MediaRow(id, wav, "audio/wav", 0, 0))
    assert(clip.brightness ==
      biased.map(_.toLong).sum.toDouble / (65535.0 * n))
    // corrupt contract matches the other audio entry points
    val mixed = Seq(MediaRow(1L, wav, "audio/wav", 0, 0),
      MediaRow(2L, wav.take(60), "audio/wav", 0, 0)).toDS()
    assert(MultimodalOps.audioWindowFeatures(mixed, 64,
      onCorrupt = CorruptPolicy.Skip).collect().map(_.id).distinct.toSeq
      == Seq(1L))
    intercept[Exception](MultimodalOps.audioWindowFeatures(mixed, 64,
      onCorrupt = CorruptPolicy.Fail).collect())
    intercept[IllegalArgumentException](
      MultimodalOps.audioWindowFeatures(mixed, 1).collect())
  }

  test("imageResize: nearest-neighbor pixel selection, corrupt policy") {
    // 2x2 source with distinct corner colors -> 1x1 keeps pixel (0, 0)
    val src = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    src.setRGB(0, 0, 0x112233); src.setRGB(1, 0, 0x445566)
    src.setRGB(0, 1, 0x778899); src.setRGB(1, 1, 0xaabbcc)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val rows = Seq(MediaRow(1L, bos.toByteArray, "image/png", 0, 0),
      MediaRow(2L, "junk".getBytes("UTF-8"), "image/png", 0, 0))
    val out = MultimodalOps.imageResize(rows.take(1).toDS(), 1, 1).collect()
    assert(out.length == 1 && out(0).width == 1 && out(0).height == 1)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).payload))
    assert((dec.getRGB(0, 0) & 0xffffff) == 0x112233)
    // 2x2 -> 4x4 upsample replicates each source pixel 2x2
    val up = MultimodalOps.imageResize(rows.take(1).toDS(), 4, 4).collect()(0)
    val dup = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(up.payload))
    assert((dup.getRGB(1, 1) & 0xffffff) == 0x112233 &&
      (dup.getRGB(2, 1) & 0xffffff) == 0x445566 &&
      (dup.getRGB(3, 3) & 0xffffff) == 0xaabbcc)
    // corrupt: Skip drops, Fail raises
    val kept = MultimodalOps.imageResize(rows.toDS(), 1, 1,
      CorruptPolicy.Skip).collect()
    assert(kept.map(_.id).toSeq == Seq(1L))
    intercept[Exception](
      MultimodalOps.imageResize(rows.toDS(), 1, 1).collect())
  }

  test("one codec init per partition; close runs on task completion") {
    CountingCodec.reset()
    val media = MultimodalOps.asMedia(
      (0L until 100L).map(i => (i, s"payload-$i")).toDF("doc_id", "text"),
      "doc_id", "text", "text/plain").repartition(4)
    val got = MultimodalOps.extractFeatures(media, codec = CountingCodec)
      .collect()
    assert(got.length == 100)
    assert(CountingCodec.decodes.get() == 100)
    assert(CountingCodec.opens.get() == 4,
      s"expected one open per partition, got ${CountingCodec.opens.get()}")
    assert(CountingCodec.closes.get() == 4,
      s"close must run per task, got ${CountingCodec.closes.get()}")
    // a custom codec produces the same features as the stub: drop-in proof
    val viaStub = MultimodalOps.extractFeatures(media).collect()
      .map(f => f.id -> f).toMap
    assert(got.forall(f => viaStub(f.id) == f))
  }

  test("parseAviMeta reads real RIFF chunk tree; fields match generator") {
    for (id <- Seq(0L, 1L, 7L, 31L, 32L, 63L, 456L)) {
      val m = MultimodalOps.parseAviMeta(id,
        MultimodalOps.syntheticAvi(id), "video/avi")
      assert(m.width == 160 + (id % 8) * 16, s"id $id width")
      assert(m.height == 120 + (id % 5) * 24, s"id $id height")
      assert(m.nFrames == 30 + id % 91, s"id $id frames")
      assert(m.usecPerFrame == 20000 + (id % 7) * 5000, s"id $id uspf")
      assert(m.byteLen ==
        MultimodalOps.syntheticAviBaseLen + 2 * (id % 32), s"id $id len")
    }
    // the parser walks chunks, it does not assume fixed offsets: a
    // JUNK chunk inserted BEFORE the hdrl LIST must not break it
    val base = MultimodalOps.syntheticAvi(5L)
    val bb = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 12) // RIFF header
    bb.put("JUNK".getBytes("US-ASCII")); bb.putInt(4)
    bb.put(Array[Byte](1, 2, 3, 4))
    bb.put(base, 12, base.length - 12)
    val shifted = bb.array()
    // fix the RIFF size field for the inserted 12 bytes
    val sz = java.nio.ByteBuffer.wrap(shifted, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sz.putInt(shifted.length - 8)
    val m5 = MultimodalOps.parseAviMeta(5L, shifted, "video/avi")
    assert(m5.width == 160 + 5 * 16 && m5.nFrames == 35L)
  }

  test("parseAviMeta corrupt contract: magic, truncation, missing avih") {
    def corrupt(bytes: Array[Byte]): String =
      intercept[MultimodalOps.CorruptPayloadException] {
        MultimodalOps.parseAviMeta(9L, bytes, "video/avi")
      }.getMessage
    assert(corrupt(null).contains("null payload"))
    assert(corrupt(Array[Byte](1, 2, 3)).contains("too short"))
    assert(corrupt("RIFX".getBytes("US-ASCII") ++
      new Array[Byte](40)).contains("not a RIFF/AVI"))
    // truncate mid-avih: chunk declares 56 bytes it does not have
    val good = MultimodalOps.syntheticAvi(9L)
    assert(corrupt(good.take(40)).contains("truncated chunk"))
    // a RIFF/AVI shell with no avih anywhere
    val bb = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(16)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("JUNK".getBytes("US-ASCII")); bb.putInt(4)
    bb.put(Array[Byte](0, 0, 0, 0))
    assert(corrupt(bb.array()).contains("no avih"))
    // Skip policy drops corrupt rows instead of failing the pass
    val media = spark.createDataset(Seq(
      MultimodalOps.MediaRow(0L, MultimodalOps.syntheticAvi(0L), "video/avi", 0, 0),
      MultimodalOps.MediaRow(1L, Array[Byte](9, 9, 9), "video/avi", 0, 0)))
    val kept = MultimodalOps.extractVideoMeta(media,
      MultimodalOps.CorruptPolicy.Skip).collect()
    assert(kept.map(_.id).toSeq == Seq(0L))
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.extractVideoMeta(media,
        MultimodalOps.CorruptPolicy.Fail).collect()
    }
    assert(e.getCause.isInstanceOf[MultimodalOps.CorruptPayloadException])
  }

  test("uniform-gray JPEG round-trip is the identity for ALL 256 values") {
    // the DC-exactness assumption behind the multimodal_video_decode
    // oracle (brightness = v/255 in closed form): every 8x8 block of a
    // uniform image is DC-only, and the JDK's JPEG path reconstructs it
    // exactly. If a JDK change ever breaks this, fail HERE, loudly, not
    // as a silent oracle drift.
    for (v <- 0 to 255) {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (v << 16) | (v << 8) | v
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      assert((back.getRGB(7, 7) & 0xffffff) == rgb, s"v=$v not DC-exact")
    }
  }

  test("decodeVideoFrames: MJPEG frames decode to the fixture closed form") {
    val ids = Seq(0L, 1L, 5L, 11L)
    val media = spark.createDataset(ids.map(id =>
      MediaRow(id, MultimodalOps.syntheticMjpegAvi(id), "video/avi", 0, 0)))
    val got = MultimodalOps.decodeVideoFrames(media).collect()
      .sortBy(f => (f.id, f.frameIdx))
    val exp = ids.sorted.flatMap { id =>
      (0 until (2 + id % 3).toInt).map { k =>
        val v = ((id * 7 + k * 31) % 256).toInt
        (id, k.toLong, (32 + (id % 4) * 8).toInt, (24 + (id % 3) * 8).toInt,
          v / 255.0)
      }
    }
    assert(got.length == exp.length)
    for ((f, (id, k, w, h, b)) <- got.zip(exp)) {
      assert(f.id == id && f.frameIdx == k && f.width == w && f.height == h)
      assert(f.brightness == b, s"id=$id k=$k: ${f.brightness} vs $b")
    }
    // ...and the metadata walk agrees with the frame count
    val meta = MultimodalOps.extractVideoMeta(media).collect()
      .map(m => m.id -> m.nFrames).toMap
    assert(meta == ids.map(id => id -> (2 + id % 3)).toMap)
  }

  test("decodeVideoFrames corrupt contract: inter-frame codec refuses loudly") {
    // a valid container whose frame bytes are NOT a self-contained JPEG
    // (the inter-frame-codec shape): must refuse, naming the frame
    val good = MultimodalOps.syntheticMjpegAvi(3L)
    val bad = good.clone()
    // find the first JPEG SOI (ff d8) after the movi list and corrupt it
    val idx = bad.indices.drop(100).find(i =>
      (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd8).get
    bad(idx) = 0x00
    val media = spark.createDataset(Seq(
      MediaRow(3L, bad, "video/avi", 0, 0)))
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeVideoFrames(media).collect()
    }
    assert(e.getCause.isInstanceOf[CorruptPayloadException])
    assert(e.getCause.getMessage.contains("frame"))
    // Skip policy drops the whole corrupt container, keeps good ones
    val mixed = spark.createDataset(Seq(
      MediaRow(3L, bad, "video/avi", 0, 0),
      MediaRow(4L, MultimodalOps.syntheticMjpegAvi(4L), "video/avi", 0, 0)))
    val kept = MultimodalOps.decodeVideoFrames(mixed,
      CorruptPolicy.Skip).collect()
    assert(kept.map(_.id).distinct.toSeq == Seq(4L))
  }

  test("dhash: deterministic, collision-exact on identical fixtures") {
    implicit val s = spark
    val media = spark.createDataset(Seq(
      MediaRow(1L, MultimodalOps.syntheticPng(5L, 8, 8), "image/png", 0, 0),
      MediaRow(2L, MultimodalOps.syntheticPng(5L, 8, 8), "image/png", 0, 0),
      MediaRow(3L, MultimodalOps.syntheticPng(6L, 8, 8), "image/png", 0, 0)))
    val hs = MultimodalOps.imageDHash(media, gridW = 8, gridH = 8)
      .collect().sortBy(_.id)
    assert(hs(0).dhash == hs(1).dhash) // identical pixels, identical hash
    assert(hs(0).dhash != hs(2).dhash) // different fixture differs
    assert(hs(0).width == 8 && hs(0).height == 8)
    // 56-bit grid: no bit above position 55
    assert((hs(0).dhash >>> 56) == 0L)
  }

  test("dhash: grid sampling replays exact source coordinates") {
    implicit val s = spark
    // a 16x16 fixture hashed on an 8x8 grid must sample pixels at
    // (2gx, 2gy) — verify against the generating formula directly
    val id = 9L
    val media = spark.createDataset(Seq(
      MediaRow(id, MultimodalOps.syntheticPng(id, 16, 16), "image/png", 0, 0)))
    val got = MultimodalOps.imageDHash(media, gridW = 8, gridH = 8)
      .collect().head.dhash
    def lum(x: Int, y: Int): Long =
      299L * ((7 * id + 13 * x + 31 * y) % 256) +
        587L * ((11 * id + 17 * x + 5 * y + 101) % 256) +
        114L * ((3 * id + 29 * x + 19 * y + 203) % 256)
    var want = 0L
    var k = 0
    for (gy <- 0 until 8; gx <- 0 until 7) {
      if (lum(2 * (gx + 1), 2 * gy) > lum(2 * gx, 2 * gy)) want |= (1L << k)
      k += 1
    }
    assert(got == want)
  }

  test("dhash: image narrower than grid refuses; corrupt payload contract") {
    implicit val s = spark
    val narrow = spark.createDataset(Seq(
      MediaRow(1L, MultimodalOps.syntheticPng(1L, 4, 8), "image/png", 0, 0)))
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.imageDHash(narrow, gridW = 8, gridH = 8).collect()
    }
    assert(e.getCause.isInstanceOf[CorruptPayloadException])
    val junk = spark.createDataset(Seq(
      MediaRow(2L, Array[Byte](1, 2, 3), "image/png", 0, 0),
      MediaRow(3L, MultimodalOps.syntheticPng(3L, 8, 8), "image/png", 0, 0)))
    val kept = MultimodalOps.imageDHash(junk, 8, 8, CorruptPolicy.Skip)
      .collect()
    assert(kept.map(_.id).toSeq == Seq(3L))
    intercept[IllegalArgumentException] {
      MultimodalOps.imageDHash(junk, gridW = 12, gridH = 8) // 88 bits
    }
  }
}
