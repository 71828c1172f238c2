package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel progress for [[FunnelStream.funnelStream]] (top-level
  * for clean encoder codegen): the furthest completed stage index
  * (-1 = none), the event time that completed it, and the newest event
  * time ever seen for the user (`seen`) — the eviction clock. `seen` is
  * tracked in state so a batch of LATE (within-watermark) events cannot
  * move the eviction deadline backwards and evict an active user early. */
final case class FunnelProgress(stage: Int, t: Long, seen: Long)

/** Streaming form of [[graft.ops.FunnelOps.funnelCounts]]: a per-user
  * state machine over `flatMapGroupsWithState`. State is one (stage, ts)
  * pair per user with event-time-timeout eviction, so total state is
  * bounded by users ACTIVE within the retention horizon — not by every
  * user ever seen (which on a high-churn stream grows without bound). A
  * stage-advance record is emitted the moment a user first reaches each
  * stage, so downstream `groupBy(stage_idx).count` IS the live funnel.
  *
  * Input must carry a watermark on its event-time column (e.g.
  * `withColumn("et", timestamp_micros($"ts_us")).withWatermark("et", …)`),
  * same contract as [[Sessionize.sessionizeStream]].
  *
  * Retention bound (mirrors the sessionizer's documented trade): a user
  * idle for more than `retentionSec` of event time is evicted — whether
  * mid-funnel or completed — and, if they return, restarts at stage 0 and
  * re-emits stage records. Size retention to the business funnel window
  * (a journey stalled for a week is usually a new journey).
  *
  * Semantics match the batch form (first stage-k occurrence strictly
  * after the stage-(k-1) completion time) for in-order arrival; an event
  * arriving EARLIER than the user's recorded completion time cannot
  * retroactively improve a past stage (same arrival-order caveat as the
  * sessionizer's late-event merge, documented there).
  */
object FunnelStream {

  final case class TypedEvent(user_id: Long, ts_us: Long, event_type: String)

  /** A user's first arrival at a stage. `gap_us` is the time-to-convert
    * from the previous stage (t_k − t_(k−1)) — the batch
    * [[graft.ops.FunnelOps.funnelConversion]] gap — or -1 for stage 0
    * (primitive sentinel keeps the encoder flat; stage 0 has no
    * predecessor). `groupBy(stage_idx).agg(count, avg/min/max of gap_us
    * where >= 0)` IS the live conversion dashboard. */
  final case class StageReached(user_id: Long, stage_idx: Int, ts_us: Long,
      gap_us: Long = -1L)

  def funnelStream(events: Dataset[TypedEvent], stages: Seq[String],
      retentionSec: Long = 86400L)
      (implicit spark: SparkSession): Dataset[StageReached] = {
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(retentionSec > 0, s"retentionSec must be positive: $retentionSec")
    // the name->index map keeps only the LAST index of a repeated name,
    // which would make earlier duplicate stages unreachable (zero output)
    // while the batch twin chains them fine — reject loudly instead
    require(stages.distinct.size == stages.size,
      s"funnelStream requires distinct stage names, got $stages " +
        "(the batch funnelCounts supports repeats)")
    val stageOf = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, StageReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[TypedEvent],
            state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            // idle past retention (possibly with the funnel completed):
            // evict — a later return is a new journey at stage 0
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption
              .getOrElse(FunnelProgress(-1, Long.MinValue, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
            var seen = cur.seen
            // in-batch events processed in event-time order so a single
            // batch reproduces the batch operator exactly. This buffers and
            // sorts ONE user's events per micro-batch — unlike the batch
            // operator this is a real per-(user, batch) memory bound; a bot
            // user needs a shorter trigger interval, not a different plan
            it.toSeq.sortBy(_.ts_us).foreach { e =>
              seen = math.max(seen, e.ts_us)
              stageOf.get(e.event_type) match {
                case Some(k) if k == cur.stage + 1 &&
                    (cur.stage == -1 || e.ts_us > cur.t) =>
                  val gap = if (k == 0) -1L else e.ts_us - cur.t
                  cur = cur.copy(stage = k, t = e.ts_us)
                  out += StageReached(user, k, e.ts_us, gap)
                case _ => // wrong stage, already passed, or not after prev
              }
            }
            cur = cur.copy(seen = seen)
            // persist on an advance OR whenever the eviction clock moved
            // for a user we already track (a late replay must not be the
            // only thing a batch writes — but it must not regress `seen`)
            if (out.nonEmpty || (state.exists && seen > state.get.seen))
              state.update(cur)
            if (state.exists) {
              // refresh eviction from the newest event time EVER SEEN (not
              // just this batch's, which for a late replay would drag the
              // deadline backwards and evict an active user early); never
              // register a timeout at/below the watermark (throws)
              val baseMs = math.max(seen, cur.t) / 1000L
              state.setTimeoutTimestamp(math.max(
                baseMs + retentionSec * 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            }
            out.iterator
          }
      }
  }
}
