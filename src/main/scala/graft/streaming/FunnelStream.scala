package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user funnel progress for [[FunnelStream.funnelStream]] (top-level
  * for clean encoder codegen): the furthest completed stage index
  * (-1 = none) and the event time that completed it. */
final case class FunnelProgress(stage: Int, t: Long)

/** Streaming form of [[graft.ops.FunnelOps.funnelCounts]]: a per-user
  * state machine over `flatMapGroupsWithState`. State is one (stage, ts)
  * pair per user — bounded regardless of event volume — and a
  * stage-advance record is emitted the moment a user first reaches each
  * stage, so downstream `groupBy(stage_idx).count` IS the live funnel.
  *
  * Semantics match the batch form (first stage-k occurrence strictly
  * after the stage-(k-1) completion time) for in-order arrival; an event
  * arriving EARLIER than the user's recorded completion time cannot
  * retroactively improve a past stage (same arrival-order caveat as the
  * sessionizer's late-event merge, documented there).
  */
object FunnelStream {

  final case class TypedEvent(user_id: Long, ts_us: Long, event_type: String)
  final case class StageReached(user_id: Long, stage_idx: Int, ts_us: Long)

  def funnelStream(events: Dataset[TypedEvent], stages: Seq[String])
      (implicit spark: SparkSession): Dataset[StageReached] = {
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    // the name->index map keeps only the LAST index of a repeated name,
    // which would make earlier duplicate stages unreachable (zero output)
    // while the batch twin chains them fine — reject loudly instead
    require(stages.distinct.size == stages.size,
      s"funnelStream requires distinct stage names, got $stages " +
        "(the batch funnelCounts supports repeats)")
    val stageOf = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, StageReached](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TypedEvent],
            state: GroupState[FunnelProgress]) =>
          var cur = state.getOption.getOrElse(FunnelProgress(-1, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
          // in-batch events processed in event-time order so a single
          // batch reproduces the batch operator exactly. This buffers and
          // sorts ONE user's events per micro-batch — unlike the batch
          // operator this is a real per-(user, batch) memory bound; a bot
          // user needs a shorter trigger interval, not a different plan
          it.toSeq.sortBy(_.ts_us).foreach { e =>
            stageOf.get(e.event_type) match {
              case Some(k) if k == cur.stage + 1 &&
                  (cur.stage == -1 || e.ts_us > cur.t) =>
                cur = FunnelProgress(k, e.ts_us)
                out += StageReached(user, k, e.ts_us)
              case _ => // wrong stage, already passed, or not after prev
            }
          }
          if (out.nonEmpty) state.update(cur)
          out.iterator
      }
  }
}
