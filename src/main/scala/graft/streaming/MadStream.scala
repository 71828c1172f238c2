package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series MAD monitor state (top-level for clean encoder codegen):
  * `recent` holds the last windowLen−1 FINALIZED bucket counts in bucket
  * order (the trailing ROWS window the batch operator reads);
  * `pendDays`/`pendXs` are watermark-open bucket partials, the
  * [[CusumMonState]] discipline. */
final case class MadMonState(recent: Seq[Long], lastFinalDay: Long,
    pendDays: Seq[Long], pendXs: Seq[Long])

/** Streaming form of [[graft.ops.ProfileOps.madAnomalies]]: the
  * median/MAD volume alarm running live. The batch operator reads a
  * trailing `rowsBetween(-(windowLen-1), current)` window over the
  * finalized bucket series; here the stream IS that series — state keeps
  * exactly the last windowLen−1 finalized counts, and each
  * watermark-finalized bucket emits (bucket, cnt, med, mad, is_anomaly)
  * with the identical integer order statistics (lower median of the
  * sorted trailing list; alarm only on a FULL window), so the alarms are
  * bit-identical to batch — pinned in MadStreamSpec.
  *
  * Bucket finalization, late-event handling, and the 100 TB feed shape
  * (the folded [[CusumStream.preReduce]] map-side combine — (series,
  * bucket) partials cross the exchange, not raw events) are exactly
  * [[CusumStream.cusumShiftStream]]'s; see its scaladoc. State per
  * series is windowLen + open-bucket longs.
  */
object MadStream {

  /** One finalized bucket's readout — the batch row plus the series key. */
  final case class MadPoint(series: String, bucket: Long, cnt: Long,
      med: Long, mad: Long, is_anomaly: Boolean)

  def madAnomaliesStream(events: Dataset[CusumStream.CusumEvent],
      windowLen: Int = 24, k: Long = 3L, bucketUs: Long = 3600000000L)
      (implicit spark: SparkSession): Dataset[MadPoint] = {
    import spark.implicits._
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    require(k >= 1L, s"k must be >= 1, got $k")
    require(bucketUs > 0L, s"bucketUs must be positive, got $bucketUs")
    CusumStream.preReduce(events, bucketUs).groupByKey(_.series)
      .flatMapGroupsWithState[MadMonState, MadPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[CusumStream.CusumEvent],
            state: GroupState[MadMonState]) =>
          val old = state.getOption.getOrElse(
            MadMonState(Nil, Long.MinValue, Nil, Nil))
          val pend = scala.collection.mutable.LongMap.empty[Long]
          old.pendDays.zip(old.pendXs).foreach { case (d, x) => pend(d) = x }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (!state.hasTimedOut) it.foreach { e =>
            val d = Math.floorDiv(e.ts_us, bucketUs)
            if (e.ts_us >= wmUs && d > old.lastFinalDay)
              pend(d) = pend.getOrElse(d, 0L) + e.inc
          }
          var recent = old.recent
          var lastFinal = old.lastFinalDay
          val out = scala.collection.mutable.ArrayBuffer.empty[MadPoint]
          pend.keys.toArray.sorted
            .takeWhile(d => (d + 1) * bucketUs <= wmUs).foreach { d =>
              val cnt = pend.remove(d).get
              lastFinal = d
              // the batch window's sorted trailing list, lower median
              // (element_at 1-indexed rank (n+1) div 2)
              val lst = (recent :+ cnt).sorted
              val med = lst((lst.size + 1) / 2 - 1)
              val devs = lst.map(x => math.abs(x - med)).sorted
              val mad = devs((lst.size + 1) / 2 - 1)
              out += MadPoint(series, d, cnt, med, mad,
                lst.size == windowLen && math.abs(cnt - med) > k * mad)
              recent = (recent :+ cnt).takeRight(windowLen - 1)
            }
          val days = pend.keys.toArray.sorted
          state.update(MadMonState(recent, lastFinal,
            days.toIndexedSeq, days.toIndexedSeq.map(pend(_))))
          if (days.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (days.head + 1) * bucketUs / 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          out.iterator
      }
  }
}
