package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CusumStream
import graft.streaming.CusumStream.{CusumEvent, CusumPoint}

/** Stream-vs-batch pinning for the live CUSUM monitor: the streaming
  * recursion S_d = max(0, S_{d-1} + Y_d) must equal the batch
  * reflection-identity evaluation day for day, for every day the
  * watermark has finalized. */
class CusumStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val DayUs = 86400000000L

  /** Deterministic synthetic day counts: 7 quiet reference days, then a
    * sustained upward shift — the textbook CUSUM scenario. */
  private def dayCounts: Seq[(Long, Long)] =
    (0L until 7L).map(d => d -> (100L + d % 3)) ++
      (7L until 20L).map(d => d -> (200L + d % 5))

  /** Expand (day, count) into count single events inside the day, plus
    * a few spread across the day so bucket assignment is exercised. */
  private def eventsOf(counts: Seq[(Long, Long)]): Seq[CusumEvent] =
    counts.flatMap { case (d, n) =>
      (0L until n).map(i => CusumEvent("m", d * DayUs + i * 1000L + 1L, 1L))
    }

  private def batchExpected(counts: Seq[(Long, Long)], refDays: Int,
      slackPermille: Long, hPermille: Long): Seq[CusumPoint] = {
    val daily = counts.toDF("day", "x")
    graft.ops.ProfileOps
      .cusumShift(daily, refDays, slackPermille, hPermille)
      .orderBy("day").collect().toSeq
      .map(r => CusumPoint("m", r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
  }

  test("multi-batch MemoryStream CUSUM == batch cusumShift, day for day") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = CusumStream.cusumShiftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[CusumEvent],
        refDays = 7, slackPermille = 100L, hPermille = 5000L)
      .writeStream.outputMode("append").format("memory").queryName("cusum1")
      .start()
    try {
      val ev = eventsOf(dayCounts)
      // chronological chunks (the watermark contract): three pushes,
      // then a sentinel on day 30 to finalize everything before it
      val chunks = ev.grouped((ev.size + 2) / 3).toSeq
      chunks.foreach { c => in.addData(c: _*); q.processAllAvailable() }
      // two sentinel pushes: the first advances the watermark past every
      // data day, the second forces a further batch that finalizes the
      // days the first push's batch could not yet see (the watermark
      // lags processing by one batch)
      in.addData(CusumEvent("m", 30L * DayUs, 1L))
      q.processAllAvailable()
      in.addData(CusumEvent("m", 31L * DayUs, 1L))
      q.processAllAvailable()
      val got = spark.table("cusum1").as[CusumPoint].collect()
        .sortBy(_.day).toSeq
      val want = batchExpected(dayCounts, 7, 100L, 5000L)
      assert(got == want && want.nonEmpty)
      // the shift scenario must actually alarm, or the pin is vacuous
      assert(want.exists(_.alarm))
    } finally q.stop()
  }

  test("one-shot parquet AvailableNow (the driver pattern) finalizes " +
      "every pre-watermark day via the timeout batch") {
    implicit val s: SparkSession = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum").toFile
    val ev = eventsOf(dayCounts) :+ CusumEvent("m", 30L * DayUs, 1L)
    ev.toDF().coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val src = spark.readStream.schema(ev.toDF().schema).parquet(dir.toString)
      .withColumn("et", timestamp_micros($"ts_us"))
      .withWatermark("et", "0 seconds").as[CusumEvent]
    val q = CusumStream.cusumShiftStream(src, refDays = 7,
        slackPermille = 100L, hPermille = 5000L)
      .writeStream.outputMode("append").format("memory").queryName("cusum2")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("cusum2").as[CusumPoint].collect().sortBy(_.day)
      .toSeq
    // watermark ends at the sentinel ts, so exactly the days whose END
    // precedes it are final — all 20 data days
    val want = batchExpected(dayCounts, 7, 100L, 5000L)
    assert(got == want && want.nonEmpty)
  }

  test("late event for an already-finalized day is dropped, not replayed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = CusumStream.cusumShiftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[CusumEvent],
        refDays = 2, slackPermille = 0L, hPermille = 2000L)
      .writeStream.outputMode("append").format("memory").queryName("cusum3")
      .start()
    try {
      // days start at 1: an event at exactly epoch 0 sits AT Spark's
      // initial watermark and the engine's late-row pre-filter drops it
      in.addData(CusumEvent("m", DayUs, 5L), CusumEvent("m", 2 * DayUs, 5L),
        CusumEvent("m", 3 * DayUs, 9L), CusumEvent("m", 10 * DayUs, 1L))
      q.processAllAvailable()
      // day 2 finalizes this batch (watermark = day 10); the replay is
      // older than the watermark and must be dropped before it can
      // pollute the closing bucket
      in.addData(CusumEvent("m", 3 * DayUs + 5L, 100L),
        CusumEvent("m", 11 * DayUs, 1L))
      q.processAllAvailable()
      in.addData(CusumEvent("m", 12 * DayUs, 1L))
      q.processAllAvailable()
      val rows = spark.table("cusum3").as[CusumPoint].collect()
      assert(rows.count(_.day == 3L) == 1)
      assert(rows.find(_.day == 3L).get.x == 9L) // not 109
    } finally q.stop()
  }

  test("folded pre-reduce: day-partials, not raw events, cross the exchange") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // count the shuffle records THIS query's stages write: with the
    // in-operator map-side combine, 10k raw events for 2 (series, day)
    // buckets must shuffle as a handful of partials, never ~10k rows.
    // Scoped by the streaming run id (micro-batch jobs run in a job
    // group keyed by it), so concurrent queries or suite parallelism
    // cannot pollute the threshold.
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    @volatile var runId: String = null
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val group = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (runId != null && group != null && group.contains(runId))
          js.stageIds.foreach(id => myStages.add(id))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (myStages.contains(sc.stageInfo.stageId))
          records.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val in = MemoryStream[CusumEvent]
    val q = CusumStream.cusumShiftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[CusumEvent],
        refDays = 1, slackPermille = 0L, hPermille = 1000L)
      .writeStream.outputMode("append").format("memory").queryName("cusum5")
      .start()
    runId = q.runId.toString
    try {
      val ev = (0L until 5000L).map(i =>
        CusumEvent("m", DayUs + i * 1000L, 1L)) ++
        (0L until 5000L).map(i => CusumEvent("m", 2 * DayUs + i * 1000L, 1L))
      in.addData(ev: _*)
      q.processAllAvailable()
      in.addData(CusumEvent("m", 10 * DayUs, 1L))
      q.processAllAvailable()
      in.addData(CusumEvent("m", 11 * DayUs, 1L))
      q.processAllAvailable()
      // listener events are async: wait until the counter settles
      var settled = false
      var tries = 0
      while (!settled && tries < 40) {
        val before = records.get()
        Thread.sleep(250)
        settled = records.get() == before && before > 0L
        tries += 1
      }
      // the combined result must still be exact: day 2 = 5000 events
      val rows = spark.table("cusum5").as[CusumPoint].collect()
      assert(rows.find(_.day == 2L).map(_.x).contains(5000L))
      assert(records.get() > 0L, "no shuffle observed — test is vacuous")
      assert(records.get() <= 64L,
        s"expected day-partials on the exchange, saw ${records.get()} " +
          "shuffled records for 10001 raw events")
    } finally {
      q.stop()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("pre-reduce late-straddle: a late event riding an on-time partial " +
      "of the same open bucket is KEPT; a lone late event is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = CusumStream.cusumShiftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[CusumEvent],
        refDays = 1, slackPermille = 0L, hPermille = 2000L)
      .writeStream.outputMode("append").format("memory").queryName("cusum6")
      .start()
    try {
      // batch 1: day 1 (the refDays=1 reference) finalizes; the day-3
      // bucket opens and the watermark lands INSIDE day 3
      in.addData(CusumEvent("m", DayUs, 1L),
        CusumEvent("m", 3 * DayUs + 1000L, 7L))
      q.processAllAvailable()
      // batch 2 — THE STRADDLE (one addData = one partition): a late
      // event (ts < watermark) and an on-time event of the SAME open
      // bucket share the partition, so the combine's partial carries
      // the on-time member's event time and the late inc RIDES IN —
      // the documented keep-more contract (CusumStream.preReduce)
      in.addData(CusumEvent("m", 3 * DayUs + 500L, 100L),
        CusumEvent("m", 3 * DayUs + 2000L, 1L))
      q.processAllAvailable()
      // batch 3: the SAME lateness alone in its partition has no
      // on-time companion — its partial is late and is dropped
      in.addData(CusumEvent("m", 3 * DayUs + 600L, 50L))
      q.processAllAvailable()
      // advance the watermark past day 3 so it finalizes and emits
      in.addData(CusumEvent("m", 5 * DayUs, 1L))
      q.processAllAvailable()
      val rows = spark.table("cusum6").as[CusumPoint].collect()
      val day3 = rows.find(_.day == 3L)
      assert(day3.isDefined, s"day 3 missing: ${rows.toSeq}")
      // keep-more on the straddle (7 + 100 + 1), drop on the lone late
      // (no +50): the contract's BOTH sides in one bucket
      assert(day3.get.x == 108L,
        s"expected x=108 (straddled late kept, lone late dropped), " +
          s"got ${day3.get}")
    } finally q.stop()
  }

  test("per-series isolation: two series keep independent state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = CusumStream.cusumShiftStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "0 seconds").as[CusumEvent],
        refDays = 1, slackPermille = 0L, hPermille = 1000L)
      .writeStream.outputMode("append").format("memory").queryName("cusum4")
      .start()
    try {
      in.addData(
        CusumEvent("a", DayUs, 10L), CusumEvent("a", 2 * DayUs, 30L),
        CusumEvent("b", DayUs, 10L), CusumEvent("b", 2 * DayUs, 10L),
        CusumEvent("a", 5 * DayUs, 1L), CusumEvent("b", 5 * DayUs, 1L))
      q.processAllAvailable()
      // second push: the finalizing batch runs with the watermark the
      // first push established
      in.addData(CusumEvent("a", 6 * DayUs, 1L), CusumEvent("b", 6 * DayUs, 1L))
      q.processAllAvailable()
      val rows = spark.table("cusum4").as[CusumPoint].collect()
      val a1 = rows.find(p => p.series == "a" && p.day == 2L).get
      val b1 = rows.find(p => p.series == "b" && p.day == 2L).get
      // a: mu0=10000 milli, y=30000-10000=20000, S=20000 > h=10000 → alarm
      assert(a1.cusum_milli == 20000L && a1.alarm)
      // b: flat — S stays 0, no alarm
      assert(b1.cusum_milli == 0L && !b1.alarm)
    } finally q.stop()
  }
}
