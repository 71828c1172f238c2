package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series CUSUM monitor state (top-level for clean encoder codegen).
  * `refSum`/`refCount` accumulate the reference window until `refCount`
  * reaches the configured refDays; `mu0Milli` is the learned level
  * (valid only once the reference is complete); `s` is the running
  * CUSUM statistic S_d; `lastFinalDay` the newest finalized bucket
  * (Long.MinValue before any); `pendDays`/`pendXs` are parallel arrays
  * of still-open (not-yet-watermarked) bucket partial sums — bounded by
  * the watermark horizon, NOT by stream length. */
final case class CusumMonState(refSum: Long, refCount: Int, mu0Milli: Long,
    s: Long, lastFinalDay: Long, pendDays: Seq[Long], pendXs: Seq[Long])

/** Streaming form of [[graft.ops.ProfileOps.cusumShift]]: the one-sided
  * upward Page CUSUM running LIVE on the ingest stream — the whole
  * point of a change-point monitor (the batch form tells you about
  * yesterday; this one raises the alarm during the shift).
  *
  * The batch operator evaluates S_d = max(0, S_{d−1} + Y_d) via the
  * reflection identity (two windows, no recursion) because batch Spark
  * has no per-row sequential state. A stream IS sequential state, so
  * here the recursion runs literally, one step per finalized day, inside
  * `flatMapGroupsWithState` — same statistic, same integer arithmetic
  * (`div`-truncation identical to the batch `(1000·Σx) div n` forms),
  * pinned stream-vs-batch in CusumStreamSpec.
  *
  * Day buckets are finalized in EVENT-TIME order when the watermark
  * passes the bucket end, so the recursion consumes days exactly as the
  * batch window does; events later than the watermark for an
  * already-finalized bucket are dropped (the standard watermark
  * contract — same trade as [[Sessionize]]'s documented late-merge
  * caveat). A bucket with zero events never finalizes a row, matching
  * the batch form where absent days simply aren't in the daily relation.
  *
  * 100 TB shape: per-series state is (reference scalars + CUSUM scalar +
  * open-bucket partials) — tens of longs, NOT per-event; and the
  * series-key exchange carries (series, bucket) PARTIALS, not raw
  * events: the operator folds a stateless per-micro-batch-partition
  * increment-combine ([[preReduce]]) ahead of `groupByKeys`, the
  * map-side-combine discipline callers previously had to apply
  * themselves (an upstream streaming `groupBy(series, day)` aggregation
  * is not an option — Spark forbids flatMapGroupsWithState after a
  * streaming aggregation). The emitted relation is day-bounded, same as
  * batch. Combine caveat (the [[Sessionize]] late-merge class of
  * trade): a partial's lateness is judged by its NEWEST member event,
  * so when one micro-batch partition holds both late and on-time events
  * of the SAME still-open bucket, the late ones ride in rather than
  * being dropped individually — observable only under that exact
  * straddle, and on the keep-more side. CONTRACT, not just behavior:
  * CusumStreamSpec's late-straddle test pins both sides (straddled
  * late kept, lone late dropped) in one bucket.
  *
  * Input must carry a watermark on its event-time column (e.g.
  * `withColumn("et", timestamp_micros($"ts_us")).withWatermark("et", …)`),
  * the [[FunnelStream.funnelStream]] contract.
  */
object CusumStream {

  /** One monitored increment: `inc` is the amount the series' bucket
    * grows by (1 for raw count streams; a partial sum for pre-reduced
    * feeds). */
  final case class CusumEvent(series: String, ts_us: Long, inc: Long)

  /** One finalized monitoring day, identical shape to the batch
    * [[graft.ops.ProfileOps.cusumShift]] row plus the series key. */
  final case class CusumPoint(series: String, day: Long, x: Long,
      cusum_milli: Long, alarm: Boolean)

  /** Stateless per-micro-batch-partition increment combine: everything
    * a partition holds for one (series, bucket) crosses the series-key
    * exchange as ONE partial (sum of incs, newest member ts as the
    * lateness representative) instead of raw events — the map-side
    * combine the monitors' shuffle owes at feed volume. Bounded memory:
    * one (sum, ts) pair per distinct (series, open bucket) per
    * partition per micro-batch — the same cardinality the downstream
    * state tracks. Shared by [[cusumShiftStream]] and
    * [[MadStream.madAnomaliesStream]]. */
  private[streaming] def preReduce(events: Dataset[CusumEvent],
      bucketUs: Long)(implicit spark: SparkSession): Dataset[CusumEvent] = {
    import org.apache.spark.sql.functions.{coalesce, col, timestamp_micros, unix_micros}
    import spark.implicits._
    // the caller's watermark column (tagged by withWatermark) must
    // survive the combine: the event-time-timeout checker requires a
    // tagged attribute in the stateful operator's child output, and the
    // engine's own late-row pre-filter reads it. The combine carries
    // the ACTUAL column values through (each partial gets the max of
    // its members' event times, re-attached under the original name +
    // metadata), so a skew-corrected or otherwise non-identity
    // watermark derivation keeps its own timeline — nothing assumes
    // et == timestamp_micros(ts_us).
    val wmField = events.toDF().schema.fields
      .find(_.metadata.contains("spark.watermarkDelayMs"))
    // ONE combine implementation for both paths: without a watermark
    // column the event time doubles as its own lateness representative
    val src = events.toDF().select(col("series"), col("ts_us"), col("inc"),
        wmField.map(f => unix_micros(coalesce(col(f.name),
            timestamp_micros(col("ts_us")))))
          .getOrElse(col("ts_us")).as("etus"))
      .as[(String, Long, Long, Long)]
    val combined = src.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap
        .empty[(String, Long), Array[Long]] // -> [inc, max ts, max et]
      it.foreach { case (series, ts, inc, et) =>
        val a = acc.getOrElseUpdate(
          (series, Math.floorDiv(ts, bucketUs)),
          Array(0L, Long.MinValue, Long.MinValue))
        a(0) += inc
        if (ts > a(1)) a(1) = ts
        if (et > a(2)) a(2) = et
      }
      acc.iterator.map { case ((s, _), a) => (s, a(1), a(0), a(2)) }
    }
    wmField match {
      case Some(f) =>
        combined.select(col("_1").as("series"), col("_2").as("ts_us"),
          col("_3").as("inc"),
          timestamp_micros(col("_4")).as(f.name, f.metadata))
          .as[CusumEvent]
      case None =>
        combined.select(col("_1").as("series"), col("_2").as("ts_us"),
          col("_3").as("inc")).as[CusumEvent]
    }
  }

  def cusumShiftStream(events: Dataset[CusumEvent], refDays: Int,
      slackPermille: Long = 0L, hPermille: Long = 2000L,
      bucketUs: Long = 86400000000L)
      (implicit spark: SparkSession): Dataset[CusumPoint] = {
    import spark.implicits._
    require(refDays >= 1, s"refDays must be >= 1, got $refDays")
    require(slackPermille >= 0L, "slackPermille must be >= 0")
    require(hPermille > 0L, "hPermille must be > 0")
    require(bucketUs > 0L, s"bucketUs must be positive, got $bucketUs")
    preReduce(events, bucketUs).groupByKey(_.series)
      .flatMapGroupsWithState[CusumMonState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[CusumEvent],
            state: GroupState[CusumMonState]) =>
          val old = state.getOption.getOrElse(
            CusumMonState(0L, 0, 0L, 0L, Long.MinValue, Nil, Nil))
          val pend = scala.collection.mutable.LongMap.empty[Long]
          old.pendDays.zip(old.pendXs).foreach { case (d, x) => pend(d) = x }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (!state.hasTimedOut) it.foreach { e =>
            val d = Math.floorDiv(e.ts_us, bucketUs)
            // the watermark contract: an event older than the watermark
            // is dropped. Spark pre-filters late rows ahead of this
            // operator (verified: an event AT the initial watermark
            // boundary never reaches the iterator), so both guards are
            // defense in depth — finalized buckets must stay immutable
            // whatever the engine's filter does across versions.
            if (e.ts_us >= wmUs && d > old.lastFinalDay)
              pend(d) = pend.getOrElse(d, 0L) + e.inc
          }
          var (refSum, refCount) = (old.refSum, old.refCount)
          var mu0 = old.mu0Milli
          var s = old.s
          var lastFinal = old.lastFinalDay
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumPoint]
          // finalize complete buckets in event-time order — this IS the
          // batch window's ORDER BY day
          pend.keys.toArray.sorted
            .takeWhile(d => (d + 1) * bucketUs <= wmUs).foreach { d =>
              val x = pend.remove(d).get
              lastFinal = d
              if (refCount < refDays) {
                refSum += x; refCount += 1
                // truncating integral division — Spark's `div`, the
                // batch twin's exact arithmetic
                if (refCount == refDays) mu0 = (1000L * refSum) / refDays
              } else {
                val slack = mu0 * slackPermille / 1000L
                val y = 1000L * x - mu0 - slack
                s = math.max(0L, s + y)
                out += CusumPoint(series, d, x, s, s > mu0 * hPermille / 1000L)
              }
            }
          val days = pend.keys.toArray.sorted
          state.update(CusumMonState(refSum, refCount, mu0, s, lastFinal,
            days.toIndexedSeq, days.toIndexedSeq.map(pend(_))))
          // wake when the earliest open bucket can finalize, so an idle
          // series still emits once the watermark passes (never register
          // at/below the watermark — throws)
          if (days.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (days.head + 1) * bucketUs / 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          out.iterator
      }
  }
}
