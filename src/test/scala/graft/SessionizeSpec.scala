package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize

/** Stateful streaming sessionization vs the batch window-function
  * definition: closed sessions emitted by flatMapGroupsWithState must
  * match the batch result for every session the stream has closed. */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val gapSec = 60L
  // user 1: two sessions (gap 100s between event 2 and 3); user 2: one
  private def events = Seq(
    Sessionize.Event(1L, 1000000000L, 1.0),
    Sessionize.Event(1L, 1030000000L, 2.0),
    Sessionize.Event(1L, 1130000000L + 60000000L, 4.0),
    Sessionize.Event(2L, 1000000000L, 8.0))

  test("batch sessionize: window-function definition") {
    val got = Sessionize.sessionizeBatch(events.toDF(), gapSec)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    assert(got == Map(
      (1L, 1L) -> ((2L, 3.0)), (1L, 2L) -> ((1L, 4.0)), (2L, 1L) -> ((1L, 8.0))))
  }

  test("streaming sessionize closes in-batch gap sessions; matches batch") {
    implicit val s: SparkSession = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toFile
    events.toDS().write.mode("overwrite").parquet(dir.toString)
    val in = spark.readStream.schema(events.toDF().schema).parquet(dir.toString)
      .withColumn("et", timestamp_micros($"ts_us"))
      .withWatermark("et", "1 second")
      .as[Sessionize.Event]
    val q = Sessionize.sessionizeStream(in, gapSec)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess").as[Sessionize.Session].collect()
      .map(x => (x.user_id, x.session_idx) -> (x.n_events, x.sum_value)).toMap
    // sessions closed by an in-stream gap must match the batch result;
    // trailing open sessions await the event-time timeout (not fired by a
    // single AvailableNow batch) - so streamed is a sub-map of batch
    val batch = Sessionize.sessionizeBatch(events.toDF(), gapSec).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(5))).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"session $k") }
    assert(streamed.contains((1L, 1L))) // the gap-closed session
  }

  test("streaming sessionize drops strays older than a gap before the open session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionizeStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "1 second").as[Sessionize.Event], gapSec)
      .writeStream.outputMode("append").format("memory").queryName("sess2")
      .start()
    try {
      // open a session at t=1000s..1030s
      in.addData(Sessionize.Event(9L, 1000000000L, 1.0),
        Sessionize.Event(9L, 1030000000L, 2.0))
      q.processAllAvailable()
      // a replayed stray from 500s (> gap before sStart) must NOT merge;
      // the closing event at 1200s then emits the unpolluted session
      in.addData(Sessionize.Event(9L, 500000000L, 99.0),
        Sessionize.Event(9L, 1200000000L, 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sess2").as[Sessionize.Session].collect()
      val first = sessions.find(_.session_idx == 1L).get
      assert(first.start_us == 1000000000L) // not dragged back to 500s
      assert(first.n_events == 2L && first.sum_value == 3.0)
    } finally q.stop()
  }

  test("streaming funnel matches the batch funnel counts") {
    import graft.streaming.FunnelStream
    implicit val s: SparkSession = spark
    val stages = Seq("view", "click", "purchase")
    // u1 full funnel; u2 clicks before viewing (stops at view); u3 views
    val ev = Seq(
      FunnelStream.TypedEvent(1L, 10L, "view"),
      FunnelStream.TypedEvent(1L, 20L, "click"),
      FunnelStream.TypedEvent(1L, 30L, "purchase"),
      FunnelStream.TypedEvent(2L, 50L, "click"),
      FunnelStream.TypedEvent(2L, 60L, "view"),
      FunnelStream.TypedEvent(2L, 70L, "click"),
      FunnelStream.TypedEvent(3L, 5L, "view"))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toFile
    ev.toDS().write.mode("overwrite").parquet(dir.toString)
    val in = spark.readStream.schema(ev.toDF().schema).parquet(dir.toString)
      .withColumn("et", timestamp_micros($"ts_us"))
      .withWatermark("et", "1 second")
      .as[FunnelStream.TypedEvent]
    val q = FunnelStream.funnelStream(in, stages)
      .writeStream.outputMode("append").format("memory").queryName("funnel")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("funnel")
      .groupBy("stage_idx").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = graft.ops.FunnelOps.funnelCounts(ev.toDF(), stages)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(streamed == Map(0 -> 3L, 1 -> 2L, 2 -> 1L))
    // the emitted gap_us records reproduce the batch conversion gaps
    val sgaps = spark.table("funnel").filter($"gap_us" >= 0)
      .groupBy("stage_idx")
      .agg(min("gap_us").as("mn"), max("gap_us").as("mx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bgaps = graft.ops.FunnelOps.funnelConversion(ev.toDF(), stages)
      .filter($"stage_idx" > 0).collect()
      .map(r => r.getInt(0) -> ((r.getLong(5), r.getLong(6)))).toMap
    assert(sgaps == bgaps)
    assert(sgaps == Map(1 -> ((10L, 10L)), 2 -> ((10L, 10L))))
  }

  test("streaming funnel carries per-user state across micro-batches") {
    import graft.streaming.FunnelStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stages = Seq("view", "click")
    val in = MemoryStream[FunnelStream.TypedEvent]
    val q = FunnelStream.funnelStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "1 second").as[FunnelStream.TypedEvent], stages)
      .writeStream.outputMode("append").format("memory").queryName("funnel2")
      .start()
    try {
      // batch 1: the view only
      in.addData(FunnelStream.TypedEvent(7L, 10L, "view"))
      q.processAllAvailable()
      // batch 2: a stale click (before the view — ignored) and a real one
      in.addData(FunnelStream.TypedEvent(7L, 5L, "click"),
        FunnelStream.TypedEvent(7L, 20L, "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel2")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // the click advance was emitted in batch 2 from batch-1 state, and
      // the stale t=5 click did not win over the t=20 one
      assert(rows == Set((7L, 0, 10L), (7L, 1, 20L)))
    } finally q.stop()
  }

  test("streaming funnel evicts idle users after retention (state bounded by active users)") {
    import graft.streaming.FunnelStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stages = Seq("view", "click")
    val in = MemoryStream[FunnelStream.TypedEvent]
    val q = FunnelStream.funnelStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "1 second").as[FunnelStream.TypedEvent],
        stages, retentionSec = 60L)
      .writeStream.outputMode("append").format("memory").queryName("funnel3")
      .start()
    try {
      // user 7 completes the funnel at t=10s..20s; timeout armed at 80s
      in.addData(FunnelStream.TypedEvent(7L, 10000000L, "view"),
        FunnelStream.TypedEvent(7L, 20000000L, "click"))
      q.processAllAvailable()
      // another user's traffic pushes the watermark to ~199s (> 80s)...
      in.addData(FunnelStream.TypedEvent(8L, 200000000L, "view"))
      q.processAllAvailable()
      // ...so this batch fires user 7's timeout and evicts the state
      in.addData(FunnelStream.TypedEvent(8L, 210000000L, "click"))
      q.processAllAvailable()
      // a returning user 7 is a NEW journey: the view re-emits stage 0,
      // which can only happen if the completed-funnel state was evicted
      in.addData(FunnelStream.TypedEvent(7L, 220000000L, "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel3")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rows == Set(
        (7L, 0, 10000000L), (7L, 1, 20000000L), // first journey
        (8L, 0, 200000000L), (8L, 1, 210000000L),
        (7L, 0, 220000000L))) // restarted journey after eviction
    } finally q.stop()
  }

  test("streaming funnel: a late replay cannot drag the eviction deadline backwards") {
    import graft.streaming.FunnelStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s: SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stages = Seq("view", "click")
    val in = MemoryStream[FunnelStream.TypedEvent]
    val q = FunnelStream.funnelStream(in.toDS()
        .withColumn("et", timestamp_micros($"ts_us"))
        .withWatermark("et", "1 second").as[FunnelStream.TypedEvent],
        stages, retentionSec = 60L)
      .writeStream.outputMode("append").format("memory").queryName("funnel4")
      .start()
    try {
      // u7 reaches stage 0 at 100s...
      in.addData(FunnelStream.TypedEvent(7L, 100000000L, "view"))
      q.processAllAvailable()
      // ...and is still ACTIVE at 1000s (non-stage traffic refreshes the
      // eviction clock); u8 moves the watermark to ~1000s
      in.addData(FunnelStream.TypedEvent(7L, 1000000000L, "scroll"),
        FunnelStream.TypedEvent(8L, 1001000000L, "view"))
      q.processAllAvailable()
      // a LATE replay from 500s arrives: with a batch-local clock this
      // would re-arm the deadline at ~max(560s, wm+1s)=1001s and the next
      // watermark step would evict an active user
      in.addData(FunnelStream.TypedEvent(7L, 500000000L, "scroll"))
      q.processAllAvailable()
      // watermark to ~1029s: above the regressed 1001s deadline, below
      // the correct 1060s one
      in.addData(FunnelStream.TypedEvent(8L, 1030000000L, "click"))
      q.processAllAvailable()
      in.addData(FunnelStream.TypedEvent(8L, 1035000000L, "view"))
      q.processAllAvailable()
      // u7 clicks at 1040s (< 60s after their 1000s activity): state must
      // still be alive, so this advances to stage 1 instead of being
      // ignored by a freshly-reset journey
      in.addData(FunnelStream.TypedEvent(7L, 1040000000L, "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel4")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(rows.contains((7L, 1, 1040000000L)),
        s"late replay evicted an active user: $rows")
    } finally q.stop()
  }

  // ---- Kaplan-Meier churn curve ----
  private val dayUs = 86400000000L

  test("kmSurvival: hand fixture matches the closed-form product limit") {
    // obs_end = day 10 (user 4's last event). gap = 1 day.
    // u1: days 0..2, quiet 8d  -> churned, T = 2
    // u2: days 0..2, quiet 8d  -> churned, T = 2
    // u3: days 1..5, quiet 5d  -> churned, T = 4
    // u4: days 3..10, active   -> censored, T = 7
    val ev = Seq(
      (1L, 0L), (1L, 2 * dayUs),
      (2L, 0L), (2L, 2 * dayUs),
      (3L, 1 * dayUs), (3L, 5 * dayUs),
      (4L, 3 * dayUs), (4L, 10 * dayUs)
    ).toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.kmSurvival(ev, gapUs = dayUs)
      .orderBy("t_day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // S(2) = 1 - 2/4 = 0.5; S(4) = 0.5 * (1 - 1/2) = 0.25; day 7 censor only
    assert(out.toSeq == Seq((2L, 4L, 2L, 0L, 0.5), (4L, 2L, 1L, 0L, 0.25),
      (7L, 1L, 0L, 1L, 0.25)))
  }

  test("entropyRate: deterministic chain is 0 bits; uniform coin is 1") {
    // user 1: a->b->a->b... deterministic transitions -> H(next|prev)=0,
    // but marginal H(next) = 1 bit (a and b equally likely)
    val det = (0 until 9).map(i =>
      (1L, i.toLong, i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r1 = graft.ops.FunnelOps.entropyRate(det).head()
    assert(r1.getAs[Double]("h_cond") == 0.0)
    assert(r1.getAs[Double]("h_marginal") == 1.0)
    assert(r1.getAs[Double]("info_gain") == 1.0)
    // balanced 2x2 transitions: knowing prev tells nothing ->
    // h_cond == h_marginal == 1, info_gain 0
    val seq2 = Seq("a", "a", "b", "b", "a", "b", "a", "a", "b")
    val coin = seq2.zipWithIndex.map { case (t, i) =>
      (1L, i.toLong, i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val r2 = graft.ops.FunnelOps.entropyRate(coin).head()
    // pairs: aa,ab,bb,ba,ab,ba,aa,ab -> from a: aa x2, ab x3; from b:
    // bb x1, ba x2 — not exactly uniform; just assert the information
    // inequality H(next|prev) <= H(next) and exact pair count
    assert(r2.getAs[Long]("n_pairs") == 8L)
    assert(r2.getAs[Double]("h_cond") <= r2.getAs[Double]("h_marginal") + 1e-9)
    assert(r2.getAs[Double]("info_gain") >= 0.0)
  }

  test("naCumHazard: hand fixture, and Breslow >= KM survival pointwise") {
    // same fixture as the KM hand test
    val ev = Seq(
      (1L, 0L), (1L, 2 * dayUs),
      (2L, 0L), (2L, 2 * dayUs),
      (3L, 1 * dayUs), (3L, 5 * dayUs),
      (4L, 3 * dayUs), (4L, 10 * dayUs)
    ).toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.naCumHazard(ev, gapUs = dayUs)
      .orderBy("t_day").collect()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // H(2) = 2/4; H(4) = 1/2 + 1/2 = 1; H(7) = 1 (censor only)
    assert(out.map(r => (r.getLong(0), r.getDouble(4))).toSeq ==
      Seq((2L, 0.5), (4L, 1.0), (7L, 1.0)))
    assert(out.map(_.getDouble(5)).toSeq ==
      Seq(r6(math.exp(-0.5)), r6(math.exp(-1.0)), r6(math.exp(-1.0))))
    // classic inequality: Breslow exp(-H) >= product-limit S, pointwise
    val km = graft.ops.FunnelOps.kmSurvival(ev, gapUs = dayUs)
      .orderBy("t_day").collect().map(_.getDouble(4))
    out.map(_.getDouble(5)).zip(km).foreach { case (b, s) =>
      assert(b >= s - 1e-9, s"breslow $b below KM $s")
    }
  }

  test("kmSurvival: all-at-risk churning on one day sends S to exact 0") {
    // C (days 8..9) sets obs_end and censors out at T=1; A and B churn
    // together at T=5 when they are the entire risk set -> d = n_risk
    // -> S = exact 0 through the zero-factor flag (not ln(0), where the
    // engines disagree)
    val ev = Seq((1L, 0L), (1L, 5 * dayUs), (2L, 0L), (2L, 5 * dayUs),
      (3L, 8 * dayUs), (3L, 9 * dayUs)).toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.kmSurvival(ev, gapUs = dayUs)
      .orderBy("t_day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 3L, 0L, 1L, 1.0), (5L, 2L, 2L, 0L, 0.0)))
  }

  test("kmSurvival: censored users never reduce survival, only risk") {
    // one churn at T=1 among N=3; two censored at T=5: S stays at the
    // T=1 level forever after
    val ev = Seq((1L, 0L), (1L, dayUs),
      (2L, 0L), (2L, 5 * dayUs), (3L, 0L), (3L, 5 * dayUs))
      .toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.kmSurvival(ev, gapUs = dayUs)
      .orderBy("t_day").collect()
    assert(out.map(_.getDouble(4)).toSeq == Seq(0.666667, 0.666667))
    assert(out.last.getLong(3) == 2L && out.last.getLong(2) == 0L)
  }

  // assignment replica of the experiment bucket rule (Knuth multiplier)
  private def abBucket(unit: Long): Long =
    ((unit % 1000000007L) * 2654435761L % 1000000007L) % 1000L

  test("logRankTest: symmetric arm lifetimes give chi2 = 0, no flag") {
    // two treat + two control units with the IDENTICAL lifetime
    // multiset: at every day d1 = d2 and n1 = n2, so O1 = E1 exactly
    val pool = (1L to 100L)
    val tu = pool.filter(u => abBucket(u) < 500).take(2)
    val cu = pool.filter(u => abBucket(u) >= 500).take(2)
    val mk = (u: Long, days: Long) => Seq((u, 0L), (u, days * dayUs))
    // lifetimes: 1 and 2 days in each arm; a late sentinel pair (one
    // per arm, days 8..9) pins obs_end so all four churn
    val sn = (pool.filter(u => abBucket(u) < 500).drop(2).head,
      pool.filter(u => abBucket(u) >= 500).drop(2).head)
    val ev = (mk(tu(0), 1) ++ mk(tu(1), 2) ++ mk(cu(0), 1) ++ mk(cu(1), 2) ++
      Seq((sn._1, 8 * dayUs), (sn._1, 9 * dayUs),
        (sn._2, 8 * dayUs), (sn._2, 9 * dayUs))).toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.logRankTest(ev, gapUs = dayUs).collect()(0)
    assert(out.getAs[Long]("observed_treat") == 2L)
    assert(out.getAs[Double]("chi2") == 0.0)
    assert(!out.getAs[Boolean]("lr_flag"))
  }

  test("logRankTest: chi2 replica on an asymmetric hand fixture") {
    // treat churns at day 1, control churns at day 3 (2 users each) +
    // a sentinel pair (days 8..9) pinning obs_end; replicate the
    // Mantel-Cox accumulation independently
    val pool = (1L to 100L)
    val tus = pool.filter(u => abBucket(u) < 500)
    val cus = pool.filter(u => abBucket(u) >= 500)
    val mk = (u: Long, days: Long) => Seq((u, 0L), (u, days * dayUs))
    val ev = (mk(tus(0), 1) ++ mk(tus(1), 1) ++ mk(cus(0), 3) ++
      mk(cus(1), 3) ++
      Seq((tus(2), 8 * dayUs), (tus(2), 9 * dayUs),
        (cus(2), 8 * dayUs), (cus(2), 9 * dayUs))).toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.logRankTest(ev, gapUs = dayUs).collect()(0)
    // independent replica over (day, d1, d2, n1, n2). Sentinels:
    // first=day8, last=day9 > obs_end-gap=day8 -> censored at
    // T=(day9-day8)//day=1, so they exit as day-1 censors. Hence
    // day1: d1=2, c1=1, d2=0, c2=1, n1=3, n2=3;
    // day3: d1=0, d2=2, n1=0 (all treat exited), n2=2.
    val table = Seq( // (d1, d2, n1, n2) in day order: day1 then day3
      (2.0, 0.0, 3.0, 3.0), (0.0, 2.0, 0.0, 2.0))
    var (o1, e1, vv) = (0.0, 0.0, 0.0)
    for ((d1, d2, n1, n2) <- table) {
      val d = d1 + d2; val n = n1 + n2
      o1 += d1; e1 += d * n1 / n
      if (n > 1) vv += d * n1 / n * n2 / n * (n - d) / (n - 1)
    }
    val chi2 = (o1 - e1) * (o1 - e1) / vv
    assert(out.getAs[Long]("observed_treat") == 2L)
    assert(math.abs(out.getAs[Double]("expected_treat") - e1) < 1e-6)
    assert(math.abs(out.getAs[Double]("chi2") - chi2) < 1e-5)
  }

  test("logRankTest: zero total variance yields NULL, not a crash") {
    // a single user (one arm only, one at-risk throughout) -> V = 0
    val ev = Seq((1L, 0L), (1L, dayUs), (1L, 9 * dayUs))
      .toDF("user_id", "ts_us")
    val out = graft.ops.FunnelOps.logRankTest(ev, gapUs = dayUs).collect()(0)
    assert(out.isNullAt(out.fieldIndex("chi2"))
      && out.isNullAt(out.fieldIndex("lr_flag")))
  }
}
