package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CusumStream, MadStream}
import graft.streaming.CusumStream.CusumEvent
import graft.streaming.MadStream.MadPoint

/** Stream-vs-batch pinning for the live MAD volume monitor: every
  * watermark-finalized bucket must carry the identical (med, mad, alarm)
  * the batch trailing-window operator computes. */
class MadStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val HourUs = 3600000000L

  /** Steady hourly volume with one 10x spike after the warm-up window —
    * exactly one alarm if and only if the window discipline matches. */
  private def hourCounts: Seq[(Long, Long)] =
    (1L until 40L).map(h => h -> (if (h == 30L) 500L else 48L + h % 5))

  private def eventsOf(counts: Seq[(Long, Long)]): Seq[CusumEvent] =
    counts.flatMap { case (h, n) =>
      (0L until n).map(i => CusumEvent("m", h * HourUs + i * 1000L + 1L, 1L))
    }

  private def batchExpected(counts: Seq[(Long, Long)], windowLen: Int,
      k: Long): Seq[MadPoint] =
    graft.ops.ProfileOps
      .madAnomalies(counts.toDF("bucket", "cnt"), "bucket", "cnt",
        windowLen, k)
      .orderBy("bucket").collect().toSeq
      .map(r => MadPoint("m", r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))

  test("one-shot parquet AvailableNow MAD stream == batch, bucket for " +
      "bucket, and the spike alarms") {
    implicit val s: SparkSession = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toFile
    val ev = eventsOf(hourCounts) :+ CusumEvent("m", 50L * HourUs, 1L)
    ev.toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val src = spark.readStream.schema(ev.toDF().schema).parquet(dir.toString)
      .withColumn("et", timestamp_micros($"ts_us"))
      .withWatermark("et", "0 seconds").as[CusumEvent]
    val q = MadStream.madAnomaliesStream(src, windowLen = 24, k = 3L,
        bucketUs = HourUs)
      .writeStream.outputMode("append").format("memory").queryName("mad1")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("mad1").as[MadPoint].collect().sortBy(_.bucket)
      .toSeq
    val want = batchExpected(hourCounts, 24, 3L)
    assert(got == want && want.nonEmpty)
    assert(want.count(_.is_anomaly) == 1 &&
      want.find(_.is_anomaly).get.bucket == 30L)
  }

  test("multi-batch MemoryStream MAD == batch across chunk boundaries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = MadStream.madAnomaliesStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[CusumEvent],
        windowLen = 5, k = 3L, bucketUs = HourUs)
      .writeStream.outputMode("append").format("memory").queryName("mad2")
      .start()
    try {
      val counts = (1L until 15L).map(h => h -> (if (h == 12L) 400L else 40L))
      val ev = eventsOf(counts)
      ev.grouped((ev.size + 3) / 4).foreach { c =>
        in.addData(c: _*); q.processAllAvailable()
      }
      in.addData(CusumEvent("m", 20L * HourUs, 1L)); q.processAllAvailable()
      in.addData(CusumEvent("m", 21L * HourUs, 1L)); q.processAllAvailable()
      val got = spark.table("mad2").as[MadPoint].collect().sortBy(_.bucket)
        .toSeq
      val want = batchExpected(counts, 5, 3L)
      assert(got == want && want.exists(_.is_anomaly))
    } finally q.stop()
  }
}
