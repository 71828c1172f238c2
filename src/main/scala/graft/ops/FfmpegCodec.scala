package graft.ops

import java.io.InputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.concurrent.TimeUnit

import graft.ops.MultimodalOps.{CorruptPayloadException, MediaCodecFactory, MediaDecoder, MediaFeatures, MediaRow}

/** Bounded external-process runner — the subprocess half of
  * [[FfmpegCodecFactory]], factored out so the plumbing (spawn, stream,
  * bounded stderr, timeout, kill) is testable WITHOUT ffmpeg in the
  * container: FfmpegCodecSpec drives it with /bin/sh fakes, and the
  * real-binary tests gate on [[FfmpegCodecFactory.available]].
  *
  * Contract: stdout streams through `sink` in chunks (never buffered
  * whole — a decoded video's raw frames can exceed heap), stderr is
  * captured bounded (diagnostics, not data), a deadline overrun
  * destroys the process tree and reports exit = -1.
  */
private[graft] object ExternalProcess {
  final case class Result(exit: Int, stderr: String)

  val MaxStderrBytes = 64 * 1024

  def run(cmd: Seq[String], timeoutSec: Long)
      (sink: (Array[Byte], Int) => Unit): Result = {
    require(cmd.nonEmpty, "empty command")
    val pb = new ProcessBuilder(cmd: _*)
    val p =
      try pb.start()
      catch {
        case e: java.io.IOException =>
          return Result(-2, s"spawn failed: ${e.getMessage}")
      }
    p.getOutputStream.close() // callers pass input via file args
    val errBuf = new java.io.ByteArrayOutputStream()
    val errPump = new Thread(() => {
      val in = p.getErrorStream
      val b = new Array[Byte](8192)
      var n = in.read(b)
      while (n >= 0) {
        if (errBuf.size() < MaxStderrBytes)
          errBuf.write(b, 0, math.min(n, MaxStderrBytes - errBuf.size()))
        n = in.read(b)
      }
    }, "graft-extproc-stderr")
    errPump.setDaemon(true)
    errPump.start()
    // WATCHDOG, not an inline deadline check: a silent process blocks
    // the stdout read() indefinitely, so the kill must come from
    // outside — destroying the process closes its pipes and unblocks
    // the reader (first version checked between reads only; the spec's
    // sleep-600 fake caught it hanging).
    @volatile var timedOut = false
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    // kill the WHOLE tree: destroying only the direct child (a shell,
    // say) leaves its children holding the inherited stdout pipe open,
    // and the read() stays blocked — the spec's sleep-600 fake caught
    // exactly that orphan
    def killTree(): Unit = {
      p.descendants().forEach(h => { h.destroyForcibly(); () })
      p.destroyForcibly()
      ()
    }
    val watchdog = new Thread(() => {
      try {
        if (!p.waitFor(timeoutSec, TimeUnit.SECONDS)) {
          timedOut = true
          killTree()
        }
      } catch { case _: InterruptedException => () }
    }, "graft-extproc-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
    try {
      val in: InputStream = p.getInputStream
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0 && !timedOut) sink(buf, n)
        n = in.read(buf)
      }
      val remaining = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
      val finished = p.waitFor(remaining, TimeUnit.MILLISECONDS)
      errPump.join(1000)
      if (timedOut || !finished) {
        killTree()
        Result(-1, s"timeout after ${timeoutSec}s; stderr so far: " +
          errBuf.toString(StandardCharsets.UTF_8.name()))
      } else {
        watchdog.interrupt()
        Result(p.exitValue(),
          errBuf.toString(StandardCharsets.UTF_8.name()))
      }
    } finally if (p.isAlive) killTree()
  }
}

/** OPT-IN external video codec behind the [[MultimodalOps.MediaCodecFactory]]
  * seam: decode through an ffmpeg/ffprobe SUBPROCESS (no JNI, no
  * bundled binaries — the library's no-native-deps rule holds; the
  * binaries are the deployment's). This retires the inter-frame-video
  * "declared non-goal" wherever ffmpeg is present: H.264/H.265/VP9/AV1
  * containers decode to the same [[MediaFeatures]] the JDK codecs
  * emit, through the same lifecycle, partitioning, and corrupt
  * contract — [[MultimodalOps.extractFeatures]] is unchanged.
  *
  * Features: real decoded dimensions (ffprobe) and mean gray-plane
  * brightness over ALL decoded frames (ffmpeg `-pix_fmt gray`
  * rawvideo, STREAMED — one 64 KB chunk resident, never a whole
  * frame set); byteLen/checksum are the shared byte-level stamps.
  * NOTE: unlike the JDK paths, decoded pixels here depend on the
  * deployed ffmpeg build — features are reproducible per binary
  * version, not engine-portable; the oracle discipline for such
  * queries is rows-only (documented, like every lossy decode).
  *
  * Lifecycle: one scratch directory per opened decoder (payloads land
  * as temp files because real containers put their index/moov at the
  * end — stdin pipes break them); close() removes it. Corrupt
  * contract: null/empty payloads, nonzero ffmpeg/ffprobe exits,
  * unparsable probe output, and zero decoded pixels all surface as
  * [[CorruptPayloadException]] (Fail/Skip policies act on it);
  * spawn failure of a MISSING binary is a config error and fails the
  * job loudly instead.
  */
class FfmpegCodecFactory(ffmpegBin: String = "ffmpeg",
    ffprobeBin: String = "ffprobe", timeoutSec: Long = 120L)
    extends MediaCodecFactory {

  override def open(): MediaDecoder = new MediaDecoder {
    private val tmpDir: Path = Files.createTempDirectory("graft-ffmpeg")

    override def decode(r: MediaRow): MediaFeatures = {
      if (r.payload == null)
        throw new CorruptPayloadException(r.id, "null payload")
      if (r.payload.isEmpty)
        throw new CorruptPayloadException(r.id, "empty payload")
      val f = Files.createTempFile(tmpDir, s"m${r.id}-", ".bin")
      try {
        Files.write(f, r.payload)
        val (w, h) = probeDims(r.id, f)
        var sum = 0L
        var count = 0L
        val res = ExternalProcess.run(Seq(ffmpegBin, "-v", "error",
          "-i", f.toString, "-f", "rawvideo", "-pix_fmt", "gray",
          "pipe:1"), timeoutSec) { (chunk, n) =>
          var i = 0
          while (i < n) { sum += (chunk(i) & 0xff); i += 1 }
          count += n
        }
        if (res.exit == -2)
          throw new IllegalStateException(
            s"ffmpeg binary not runnable ('$ffmpegBin'): ${res.stderr}")
        if (res.exit != 0)
          throw new CorruptPayloadException(r.id,
            s"ffmpeg decode failed (exit ${res.exit}): ${res.stderr.take(500)}")
        if (count == 0L)
          throw new CorruptPayloadException(r.id, "ffmpeg decoded no pixels")
        MediaFeatures(r.id, r.mediaType, r.payload.length.toLong,
          MultimodalOps.byteChecksum(r.payload),
          sum.toDouble / (255.0 * count), w, h)
      } finally Files.deleteIfExists(f)
    }

    private def probeDims(id: Long, f: Path): (Int, Int) = {
      val out = new java.io.ByteArrayOutputStream()
      val res = ExternalProcess.run(Seq(ffprobeBin, "-v", "error",
        "-select_streams", "v:0", "-show_entries", "stream=width,height",
        "-of", "csv=p=0", f.toString), timeoutSec) { (chunk, n) =>
        out.write(chunk, 0, n)
      }
      if (res.exit == -2)
        throw new IllegalStateException(
          s"ffprobe binary not runnable ('$ffprobeBin'): ${res.stderr}")
      if (res.exit != 0)
        throw new CorruptPayloadException(id,
          s"ffprobe failed (exit ${res.exit}): ${res.stderr.take(500)}")
      val line = out.toString(StandardCharsets.UTF_8.name()).trim
        .linesIterator.toSeq.headOption.getOrElse("")
      line.split(",") match {
        case Array(w, h) if w.trim.nonEmpty && h.trim.nonEmpty =>
          try (w.trim.toInt, h.trim.toInt)
          catch {
            case _: NumberFormatException =>
              throw new CorruptPayloadException(id,
                s"ffprobe emitted non-numeric dimensions: '$line'")
          }
        case _ => throw new CorruptPayloadException(id,
          s"no video stream found (probe output: '$line')")
      }
    }

    override def close(): Unit = {
      // best-effort scratch cleanup; files are deleted per decode
      // already. The directory stream must close too — an unclosed
      // Files.list leaks one fd per decoder close.
      try {
        val ls = Files.list(tmpDir)
        try ls.forEach(p => Files.deleteIfExists(p)) finally ls.close()
        Files.deleteIfExists(tmpDir)
      } catch { case _: java.io.IOException => () }
    }
  }
}

object FfmpegCodecFactory {
  /** Both binaries present and runnable — the test gate and the
    * deployment preflight. */
  def available(ffmpegBin: String = "ffmpeg",
      ffprobeBin: String = "ffprobe"): Boolean =
    Seq(ffmpegBin, ffprobeBin).forall { bin =>
      ExternalProcess.run(Seq(bin, "-version"), 10L)((_, _) => ()).exit == 0
    }
}
