package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftStream
import graft.streaming.DriftStream.{DriftEvent, DriftPoint}

/** Streaming distribution-drift monitor: stream-vs-reference equality
  * (multi-batch reference learning + exact integer statistic), the
  * planted-shift alarm, and the loud bin contract. */
class DriftStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val DayUs = 86400000000L
  private val NB = 4

  /** Driver-side replay of the monitor's contract over (day -> bins):
    * reference = first refDays days in day order, later days scored
    * with the exact truncated-integer statistic. */
  private def expected(days: Seq[(Long, Array[Long])], refDays: Int,
      alarmE6: Long): Seq[DriftPoint] = {
    val ref = Array.fill(NB)(0L)
    days.take(refDays).foreach { case (_, bs) =>
      (0 until NB).foreach(b => ref(b) += bs(b)) }
    days.drop(refDays).map { case (d, bs) =>
      val n = bs.sum
      val rr = ref.sum
      var chi2 = 0L
      for (b <- 0 until NB) {
        val e = (BigInt(ref(b)) * n / rr).toLong
        val s = bs(b) + e
        if (s > 0L) chi2 += (BigInt(bs(b) - e) * (bs(b) - e) * 1000000L / s).toLong
      }
      DriftPoint("m", d, n, chi2, chi2 > alarmE6)
    }
  }

  private def eventsOf(days: Seq[(Long, Array[Long])]): Seq[DriftEvent] =
    days.flatMap { case (d, bs) =>
      bs.zipWithIndex.flatMap { case (c, b) =>
        (0L until c).map(i => DriftEvent("m", d * DayUs + b * 1000L + i, b, 1L))
      }
    }

  test("multi-batch stream == driver replay; planted shift raises the alarm") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference days 1-2 ~uniform; day 3 in-distribution; day 4 SHIFTED
    // (mass piles into bin 3); day 5 exists only to finalize day 4
    val days = Seq(
      1L -> Array(10L, 12L, 9L, 11L),
      2L -> Array(11L, 10L, 12L, 10L),
      3L -> Array(10L, 11L, 10L, 11L),
      4L -> Array(2L, 1L, 3L, 36L),
      5L -> Array(1L, 1L, 1L, 1L))
    val in = MemoryStream[DriftEvent]
    val q = DriftStream.chi2DriftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[DriftEvent],
        nBins = NB, refDays = 2, alarmE6 = 10000000L)
      .writeStream.outputMode("append").format("memory").queryName("drift1")
      .start()
    try {
      // split mid-day to exercise cross-batch open-bucket state
      val ev = eventsOf(days)
      val (b1, b2) = ev.splitAt(ev.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // nudge events advance the watermark so days 4 and 5 finalize (a
      // batch must RUN with the advanced watermark — the second nudge
      // is that batch); their own trailing buckets are filtered below
      in.addData(DriftEvent("m", 6 * DayUs, 0, 1L)); q.processAllAvailable()
      in.addData(DriftEvent("m", 7 * DayUs, 0, 1L)); q.processAllAvailable()
      val got = spark.table("drift1").as[DriftPoint].collect()
        .filter(_.day <= 5L).sortBy(_.day).toSeq
      // finalized scored days: 3, 4, 5
      val want = expected(days, refDays = 2, alarmE6 = 10000000L)
      assert(got == want, s"\ngot  $got\nwant $want")
      assert(!got.find(_.day == 3L).get.alarm, "in-distribution day alarmed")
      assert(got.find(_.day == 4L).get.alarm, "planted shift missed")
    } finally q.stop()
  }

  test("chi2 statistic handles one-sided bins (a=0 or e=0) exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference has NO mass in bin 3; the scored day has mass ONLY in
    // bins the reference never saw and misses a reference bin entirely
    val days = Seq(
      1L -> Array(8L, 8L, 0L, 0L),
      2L -> Array(0L, 0L, 6L, 10L),
      3L -> Array(1L, 1L, 1L, 1L))
    val in = MemoryStream[DriftEvent]
    val q = DriftStream.chi2DriftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[DriftEvent],
        nBins = NB, refDays = 1, alarmE6 = 1000000L)
      .writeStream.outputMode("append").format("memory").queryName("drift2")
      .start()
    try {
      in.addData(eventsOf(days): _*); q.processAllAvailable()
      in.addData(DriftEvent("m", 9 * DayUs, 0, 1L)); q.processAllAvailable()
      val got = spark.table("drift2").as[DriftPoint].collect()
        .sortBy(_.day).toSeq
      assert(got == expected(days, refDays = 1, alarmE6 = 1000000L))
      assert(got.head.alarm, "total shape replacement must alarm")
    } finally q.stop()
  }

  test("out-of-range bin fails loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DriftEvent]
    val q = DriftStream.chi2DriftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[DriftEvent],
        nBins = NB, refDays = 1, alarmE6 = 1000000L)
      .writeStream.outputMode("append").format("memory").queryName("drift3")
      .start()
    try {
      in.addData(DriftEvent("m", DayUs, NB, 1L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage != null)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      DriftStream.chi2DriftStream(in.toDS().as[DriftEvent],
        nBins = 1, refDays = 1, alarmE6 = 1L)(spark)
    }
  }

  test("negative increment and zero-mass reference fail diagnosably") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // a negative inc would silently corrupt the histograms: loud refusal
    val in = MemoryStream[DriftEvent]
    val q = DriftStream.chi2DriftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[DriftEvent],
        nBins = NB, refDays = 1, alarmE6 = 1000000L)
      .writeStream.outputMode("append").format("memory").queryName("drift4")
      .start()
    try {
      in.addData(DriftEvent("m", DayUs, 0, -1L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage != null)
    } finally q.stop()
    // a reference learned entirely from zero-mass buckets (inc = 0
    // events only) must refuse at SCORE time with the series named,
    // not throw an unguided ArithmeticException from inside chi2E6
    val in2 = MemoryStream[DriftEvent]
    val q2 = DriftStream.chi2DriftStream(in2.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[DriftEvent],
        nBins = NB, refDays = 1, alarmE6 = 1000000L)
      .writeStream.outputMode("append").format("memory").queryName("drift5")
      .start()
    try {
      // day 1 (the whole reference window): a single zero-inc event;
      // day 2 has real mass; day 3+ nudges finalize day 2 -> score
      in2.addData(DriftEvent("m", DayUs, 0, 0L),
        DriftEvent("m", 2 * DayUs, 1, 5L))
      q2.processAllAvailable()
      in2.addData(DriftEvent("m", 4 * DayUs, 0, 1L))
      val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
        in2.addData(DriftEvent("m", 5 * DayUs, 0, 1L))
        q2.processAllAvailable()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e2).exists(_.contains("all-zero")),
        s"want the diagnosable zero-mass refusal, got ${chain(e2)}")
    } finally q2.stop()
  }
}
