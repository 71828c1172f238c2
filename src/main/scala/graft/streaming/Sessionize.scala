package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user state for [[Sessionize.sessionizeStream]] (top-level so the
  * bean/product encoder codegen resolves it cleanly). sN == 0 encodes
  * "no open session, but keep the idx counter" — after a timeout the
  * counter survives for ONE more gap (so ids stay monotonic for a
  * promptly-returning user) and is then evicted entirely, keeping state
  * bounded by concurrently-active users rather than all users ever
  * seen. */
final case class OpenSessionState(sIdx: Long, sN: Long, sStart: Long,
    sEnd: Long, sSum: Double)

/** Event sessionization — the canonical stateful streaming operator for an
  * events pipeline. Two implementations sharing one definition of a
  * session (events of a user with gaps <= `gapSec`):
  *
  *  - [[sessionizeBatch]]: pure window functions (lag → gap flag →
  *    running-sum session index → groupBy). Scales as a shuffle on
  *    user_id; window state is per-user-partition and streamed by the
  *    sort-based window exec. Engine-portable SQL (DuckDB oracle).
  *
  *  - [[sessionizeStream]]: `flatMapGroupsWithState` with event-time
  *    timeout — bounded state (one open session per user), sessions
  *    emitted when closed by a gap or by watermark timeout.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_us: Long, value: Double)
  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long, sum_value: Double)

  /** Batch sessionization over (user_id, ts_us: long micros, value). */
  def sessionizeBatch(df: DataFrame, gapSec: Long): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts_us")
    val gapUs = gapSec * 1000000L
    df.withColumn("prev", lag(col("ts_us"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess"))
        .over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        sum(col("value")).as("sum_value"))
  }

  /** The identical computation as DuckDB SQL (ts_us expr supplied). */
  def batchOracleSql(table: String, tsUsExpr: String, gapSec: Long): String =
    s"""WITH e AS (SELECT user_id, $tsUsExpr AS ts_us, value FROM $table),
       |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
       |        OR ts_us - lag(ts_us) OVER w > ${gapSec * 1000000L}
       |        THEN 1 ELSE 0 END AS new_sess
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
       |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
       |        ROWS UNBOUNDED PRECEDING) AS session_idx FROM g)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us,
       |  round(sum(value), 2) AS sum_value
       |FROM s GROUP BY 1, 2""".stripMargin

  /** Streaming sessionization: one open session per user in state; closed
    * sessions emitted when a gap arrives in-stream or event-time timeout
    * fires. Input must carry a watermark on its event-time column. */
  def sessionizeStream(events: Dataset[Event], gapSec: Long)
      (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          if (state.hasTimedOut) {
            state.getOption.foreach { o =>
              if (o.sN > 0) {
                out += Session(user, o.sIdx, o.sN, o.sStart, o.sEnd, o.sSum)
                // keep the counter (sN=0 marker) for one more gap so
                // session ids stay monotonic for a promptly-returning
                // user — but register a second timeout that DELETES it:
                // a permanent marker per distinct user ever seen is
                // unbounded state on a high-churn stream
                state.update(o.copy(sN = 0, sSum = 0.0))
                state.setTimeoutTimestamp(
                  state.getCurrentWatermarkMs() + gapSec * 1000L)
              } else {
                // grace window passed with no return: evict fully (a user
                // returning later restarts at session_idx 1 — the
                // documented retention bound)
                state.remove()
              }
            }
          } else {
            var cur = state.getOption.filter(_.sN > 0)
            val baseIdx = state.getOption.map(_.sIdx).getOrElse(0L)
            it.toSeq.sortBy(_.ts_us).foreach { e =>
              cur match {
                // an event more than a gap OLDER than the open session's
                // start belongs to an already-closed earlier session —
                // merging it would drag start_us unboundedly backwards
                // (a replayed hours-old row stretches the session over
                // the whole span). Dropped, the same fate a watermarked
                // windowed aggregate gives beyond-watermark strays.
                case Some(o) if e.ts_us < o.sStart - gapUs => ()
                // flatMapGroupsWithState does NOT drop late rows at the
                // watermark: merge IN-RANGE lates with min/max so a late
                // event can never move the session end backwards (or
                // start forwards)
                case Some(o) if e.ts_us - o.sEnd <= gapUs =>
                  cur = Some(o.copy(sN = o.sN + 1,
                    sStart = math.min(o.sStart, e.ts_us),
                    sEnd = math.max(o.sEnd, e.ts_us), sSum = o.sSum + e.value))
                case Some(o) =>
                  out += Session(user, o.sIdx, o.sN, o.sStart, o.sEnd, o.sSum)
                  cur = Some(OpenSessionState(o.sIdx + 1, 1, e.ts_us, e.ts_us, e.value))
                case None =>
                  cur = Some(OpenSessionState(baseIdx + 1, 1, e.ts_us, e.ts_us, e.value))
              }
            }
            cur.foreach { o =>
              state.update(o)
              // never register a timeout at/below the watermark (throws)
              val target = o.sEnd / 1000L + gapSec * 1000L
              state.setTimeoutTimestamp(
                math.max(target, state.getCurrentWatermarkMs() + 1000L))
            }
          }
          out.iterator
      }
  }
}
