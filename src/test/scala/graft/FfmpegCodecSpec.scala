package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ExternalProcess, FfmpegCodecFactory, MultimodalOps}
import graft.ops.MultimodalOps.{CorruptPayloadException, MediaRow}

/** The external-codec seam: subprocess plumbing exercised for real with
  * /bin/sh fakes (no ffmpeg needed), and the actual ffmpeg/ffprobe
  * decode + corrupt-contract parity gated on binary presence. */
class FfmpegCodecSpec extends AnyFunSuite {

  private def script(body: String): String = {
    val f = Files.createTempFile("graft-fake-codec", ".sh")
    Files.write(f, s"#!/bin/sh\n$body\n".getBytes(StandardCharsets.UTF_8))
    f.toFile.setExecutable(true)
    f.toString
  }

  test("ExternalProcess: streams stdout in chunks, captures exit + stderr") {
    val s = script("""printf 'abcde'; echo "warn: x" 1>&2; exit 0""")
    val out = new java.io.ByteArrayOutputStream()
    val r = ExternalProcess.run(Seq(s), 10L)((b, n) => out.write(b, 0, n))
    assert(r.exit == 0)
    assert(out.toString("UTF-8") == "abcde")
    assert(r.stderr.contains("warn: x"))
  }

  test("ExternalProcess: nonzero exit and large bounded stderr") {
    val s = script(
      """i=0; while [ $i -lt 20000 ]; do echo "eeeeeeeeee" 1>&2; i=$((i+1)); done; exit 3""")
    val r = ExternalProcess.run(Seq(s), 30L)((_, _) => ())
    assert(r.exit == 3)
    assert(r.stderr.length <= ExternalProcess.MaxStderrBytes)
    assert(r.stderr.nonEmpty)
  }

  test("ExternalProcess: hanging process is killed at the deadline") {
    val s = script("sleep 600")
    val t0 = System.nanoTime()
    val r = ExternalProcess.run(Seq(s), 2L)((_, _) => ())
    val el = (System.nanoTime() - t0) / 1e9
    assert(r.exit == -1, s"expected timeout sentinel, got ${r.exit}")
    assert(el < 30.0, s"kill took too long: $el s")
    assert(r.stderr.contains("timeout"))
  }

  test("ExternalProcess: missing binary reports spawn failure, not a hang") {
    val r = ExternalProcess.run(Seq("/no/such/binary-xyz"), 5L)((_, _) => ())
    assert(r.exit == -2)
    assert(r.stderr.contains("spawn failed"))
  }

  test("codec seam with fake binaries: features flow, corrupt surfaces") {
    // fake ffprobe prints dimensions; fake ffmpeg emits 4 gray pixels
    // of value 51 -> brightness 51/255 = 0.2
    val probe = script("""echo "3,2"""")
    val mpeg = script("""printf '\063\063\063\063'""")
    val dec = new FfmpegCodecFactory(mpeg, probe, 10L).open()
    try {
      val f = dec.decode(MediaRow(7L, Array[Byte](1, 2, 3), "video/x", 0, 0))
      assert(f.width == 3 && f.height == 2)
      assert(f.byteLen == 3L)
      assert(math.abs(f.brightness - 51.0 / 255.0) < 1e-12)
      assert(f.checksum == MultimodalOps.StubCodec
        .decode(MediaRow(7L, Array[Byte](1, 2, 3), "video/x", 0, 0)).checksum)
      // corrupt: null + empty payloads
      intercept[CorruptPayloadException] {
        dec.decode(MediaRow(8L, null, "video/x", 0, 0))
      }
      intercept[CorruptPayloadException] {
        dec.decode(MediaRow(9L, Array.empty[Byte], "video/x", 0, 0))
      }
    } finally dec.close()
    // decoder failure (nonzero exit) is corrupt, not a job bug
    val badMpeg = script("""echo "moov atom not found" 1>&2; exit 1""")
    val dec2 = new FfmpegCodecFactory(badMpeg, probe, 10L).open()
    try {
      val e = intercept[CorruptPayloadException] {
        dec2.decode(MediaRow(10L, Array[Byte](1), "video/x", 0, 0))
      }
      assert(e.getMessage.contains("moov"))
    } finally dec2.close()
    // no video stream in probe output
    val emptyProbe = script("exit 0")
    val dec3 = new FfmpegCodecFactory(mpeg, emptyProbe, 10L).open()
    try {
      intercept[CorruptPayloadException] {
        dec3.decode(MediaRow(11L, Array[Byte](1), "video/x", 0, 0))
      }
    } finally dec3.close()
    // a MISSING binary is a config error, loud — never a corrupt-skip
    val dec4 = new FfmpegCodecFactory("/no/such/ffmpeg", probe, 10L).open()
    try {
      intercept[IllegalStateException] {
        dec4.decode(MediaRow(12L, Array[Byte](1), "video/x", 0, 0))
      }
    } finally dec4.close()
  }

  // ---- real-binary tests (gated; run wherever ffmpeg is deployed) -------

  test("real ffmpeg: MJPEG-AVI parity with the JDK frame decoder") {
    assume(FfmpegCodecFactory.available(), "ffmpeg/ffprobe not installed")
    // id=42: w = 32 + (42%4)*8 = 48, h = 24 + (42%3)*8 = 24
    val avi = MultimodalOps.syntheticMjpegAvi(42L)
    val dec = new FfmpegCodecFactory().open()
    try {
      val f = dec.decode(MediaRow(42L, avi, "video/avi", 0, 0))
      assert(f.width == 48 && f.height == 24)
      // JDK path decodes the same frames; means must agree to JPEG
      // tolerance (different IDCTs: +-2/255 per channel)
      val jdk = MultimodalOps.decodeMjpegFrames(42L, avi)
      val jdkMean = jdk.map(_.brightness).sum / jdk.size
      assert(math.abs(f.brightness - jdkMean) < 2.5 / 255.0,
        s"ffmpeg ${f.brightness} vs jdk $jdkMean")
    } finally dec.close()
  }

  test("committed y4m fixture: bitstream hash pinned (runs everywhere)") {
    // the fixture half of the decode certificate runs in EVERY
    // environment: the committed bitstream must be byte-identical to
    // what FIXTURES.md records, so a green gated decode on an
    // ffmpeg-equipped box certifies a known input, not a drifted one
    val bytes = fixtureBytes()
    assert(bytes.length == 176)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(sha ==
      "634726a252304a5c59a4838812fbc0757b1fb3689a9e3cab0b7e051a6d75c224")
  }

  test("real ffmpeg: committed fixture decodes to the EXACT pinned features") {
    assume(FfmpegCodecFactory.available(), "ffmpeg/ffprobe not installed")
    // mono y4m is an IDENTITY decode (-pix_fmt gray copies the Y plane,
    // no IDCT, no chroma math), so the features are exact across ffmpeg
    // builds — the deterministic decode certificate FIXTURES.md records:
    // 2 frames of 8x8, planes all-64 then all-200 -> mean 132/255
    val bytes = fixtureBytes()
    val dec = new FfmpegCodecFactory().open()
    try {
      val f = dec.decode(MediaRow(7L, bytes, "video/y4m", 0, 0))
      assert(f.width == 8 && f.height == 8)
      assert(f.byteLen == 176L)
      val sum = 64.0 * 64 + 200.0 * 64
      assert(f.brightness == sum / (255.0 * 128.0),
        s"gray-plane mean drifted: ${f.brightness}")
    } finally dec.close()
  }

  private def fixtureBytes(): Array[Byte] = {
    val in = getClass.getResourceAsStream("/fixtures/gray-2f-8x8.y4m")
    assert(in != null, "fixture resource missing")
    try in.readAllBytes() finally in.close()
  }

  test("real ffmpeg: corrupt-contract parity (garbage refused as corrupt)") {
    assume(FfmpegCodecFactory.available(), "ffmpeg/ffprobe not installed")
    val dec = new FfmpegCodecFactory().open()
    try {
      intercept[CorruptPayloadException] {
        dec.decode(MediaRow(1L, Array.fill[Byte](256)(7), "video/mp4", 0, 0))
      }
    } finally dec.close()
  }
}
