package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-series drift-monitor state (top-level for clean encoder codegen):
  * `refBins`/`refCount` accumulate the reference histogram until
  * `refCount` buckets have folded in; `pendDays`/`pendBins` are the
  * still-open (not-yet-watermarked) buckets' bin counts — bounded by
  * the watermark horizon × nBins, never by stream length. */
final case class DriftMonState(refBins: Seq[Long], refCount: Int,
    lastFinalDay: Long, pendDays: Seq[Long], pendBins: Seq[Seq[Long]])

/** Streaming DISTRIBUTION-DRIFT monitor — the third member of the live
  * monitoring family ([[CusumStream]] watches the level,
  * [[MadStream]] robust outliers; this watches the SHAPE): per series,
  * maintain a binned histogram per event-time bucket, learn a
  * reference distribution from the first `refDays` finalized buckets,
  * then score every later finalized bucket against it with an
  * ALL-INTEGER Pearson statistic and raise the alarm while the drift
  * is happening, not in tomorrow's batch job.
  *
  * Statistic (exact, engine-replayable — no float anywhere): for a
  * finalized bucket with bin counts a_b (N = Σ a_b) and reference
  * counts r_b (R = Σ r_b), the expected counts are the truncated
  * e_b = (r_b · N) div R and
  *   chi2_e6 = Σ_b (10⁶ · (a_b − e_b)²) div (a_b + e_b)   [a_b+e_b > 0]
  * — per-bin truncating division then an integer sum, the
  * [[graft.ops.ProfileOps.binnedChi2]] discipline hardened one step
  * further (that operator rounds one float division; here even that is
  * integral, so the oracle replays bit-for-bit on any engine).
  * Intermediates ride BigInt on the way to a Long that is bounded by
  * 10⁶·(a+e) ≤ 2·10⁶·N per bin (document-scale safe).
  *
  * 100 TB shape, the [[CusumStream]] contract throughout: per-series
  * state is (nBins reference longs + open buckets × nBins), NOT
  * per-event; the series-key exchange carries (series, bucket, bin)
  * PARTIALS from the folded map-side combine, not raw events; buckets
  * finalize in event-time order when the watermark passes (late events
  * for finalized buckets drop; the [[CusumStream.preReduce]]
  * late-straddle trade applies identically). Input must carry a
  * watermark on its event-time column.
  */
object DriftStream {

  /** One binned increment: `bin` must lie in [0, nBins) — typically an
    * [[graft.hist.Axis]] binCol output (flow bins included), computed
    * upstream so the monitor stays axis-agnostic. */
  final case class DriftEvent(series: String, ts_us: Long, bin: Int,
      inc: Long)

  /** One finalized, scored bucket. */
  final case class DriftPoint(series: String, day: Long, n: Long,
      chi2_e6: Long, alarm: Boolean)

  /** Stateless per-micro-batch-partition combine — the
    * [[CusumStream.preReduce]] discipline keyed by (series, bucket,
    * bin): everything a partition holds for one cell crosses the
    * series-key exchange as ONE partial (inc sum, newest member ts as
    * the lateness representative), and the caller's watermark column
    * survives with its metadata (max member event time re-attached
    * under the original name). */
  private[streaming] def preReduce(events: Dataset[DriftEvent],
      bucketUs: Long)(implicit spark: SparkSession): Dataset[DriftEvent] = {
    import org.apache.spark.sql.functions.{coalesce, col, timestamp_micros, unix_micros}
    import spark.implicits._
    val wmField = events.toDF().schema.fields
      .find(_.metadata.contains("spark.watermarkDelayMs"))
    val src = events.toDF().select(col("series"), col("ts_us"), col("bin"),
        col("inc"),
        wmField.map(f => unix_micros(coalesce(col(f.name),
            timestamp_micros(col("ts_us")))))
          .getOrElse(col("ts_us")).as("etus"))
      .as[(String, Long, Int, Long, Long)]
    val combined = src.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap
        .empty[(String, Long, Int), Array[Long]] // -> [inc, max ts, max et]
      it.foreach { case (series, ts, bin, inc, et) =>
        val a = acc.getOrElseUpdate(
          (series, Math.floorDiv(ts, bucketUs), bin),
          Array(0L, Long.MinValue, Long.MinValue))
        a(0) += inc
        if (ts > a(1)) a(1) = ts
        if (et > a(2)) a(2) = et
      }
      acc.iterator.map { case ((s, _, b), a) => (s, a(1), b, a(0), a(2)) }
    }
    wmField match {
      case Some(f) =>
        combined.select(col("_1").as("series"), col("_2").as("ts_us"),
          col("_3").as("bin"), col("_4").as("inc"),
          timestamp_micros(col("_5")).as(f.name, f.metadata))
          .as[DriftEvent]
      case None =>
        combined.select(col("_1").as("series"), col("_2").as("ts_us"),
          col("_3").as("bin"), col("_4").as("inc")).as[DriftEvent]
    }
  }

  /** The exact integer statistic — shared with the oracle generator so
    * the formula exists once. */
  private[streaming] def chi2E6(a: Array[Long], r: Array[Long]): (Long, Long) = {
    val n = a.sum
    val rr = r.sum
    require(rr > 0L, "chi2E6: zero-mass reference histogram")
    var chi2 = 0L
    var b = 0
    while (b < a.length) {
      val e = (BigInt(r(b)) * n / rr).toLong
      val s = a(b) + e
      if (s > 0L) {
        val d = a(b) - e
        chi2 += (BigInt(d) * d * 1000000L / s).toLong
      }
      b += 1
    }
    (n, chi2)
  }

  def chi2DriftStream(events: Dataset[DriftEvent], nBins: Int,
      refDays: Int, alarmE6: Long, bucketUs: Long = 86400000000L)
      (implicit spark: SparkSession): Dataset[DriftPoint] = {
    import spark.implicits._
    require(nBins >= 2 && nBins <= 4096,
      s"nBins must be in [2, 4096], got $nBins")
    require(refDays >= 1, s"refDays must be >= 1, got $refDays")
    require(alarmE6 > 0L, s"alarmE6 must be > 0, got $alarmE6")
    require(bucketUs > 0L, s"bucketUs must be positive, got $bucketUs")
    preReduce(events, bucketUs).groupByKey(_.series)
      .flatMapGroupsWithState[DriftMonState, DriftPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, it: Iterator[DriftEvent],
            state: GroupState[DriftMonState]) =>
          val old = state.getOption.getOrElse(
            DriftMonState(Seq.fill(nBins)(0L), 0, Long.MinValue, Nil, Nil))
          val pend = scala.collection.mutable.LongMap.empty[Array[Long]]
          old.pendDays.zip(old.pendBins).foreach { case (d, bs) =>
            pend(d) = bs.toArray }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          if (!state.hasTimedOut) it.foreach { e =>
            require(e.bin >= 0 && e.bin < nBins,
              s"drift bin out of [0, $nBins): ${e.bin}")
            require(e.inc >= 0L,
              s"drift increment must be >= 0, got ${e.inc} " +
                s"(series $series, bin ${e.bin})")
            val d = Math.floorDiv(e.ts_us, bucketUs)
            // finalized buckets stay immutable whatever the engine's
            // late-row pre-filter does across versions (CusumStream's
            // defense-in-depth guard)
            if (e.ts_us >= wmUs && d > old.lastFinalDay)
              pend.getOrElseUpdate(d, Array.fill(nBins)(0L))(e.bin) += e.inc
          }
          val refBins = old.refBins.toArray
          var refCount = old.refCount
          var lastFinal = old.lastFinalDay
          val out = scala.collection.mutable.ArrayBuffer.empty[DriftPoint]
          pend.keys.toArray.sorted
            .takeWhile(d => (d + 1) * bucketUs <= wmUs).foreach { d =>
              val bins = pend.remove(d).get
              lastFinal = d
              if (refCount < refDays) {
                var b = 0
                while (b < nBins) { refBins(b) += bins(b); b += 1 }
                refCount += 1
              } else {
                // a zero-mass reference cannot score anything: refuse
                // diagnosably instead of letting chi2E6 divide by zero
                // deep inside the streaming query
                require(refBins.exists(_ > 0L),
                  s"drift reference for series '$series' is all-zero " +
                    s"after refDays=$refDays reference buckets — the " +
                    "reference window saw no mass; widen refDays or fix " +
                    "the upstream increments")
                val (n, chi2) = chi2E6(bins, refBins)
                out += DriftPoint(series, d, n, chi2, chi2 > alarmE6)
              }
            }
          val days = pend.keys.toArray.sorted
          state.update(DriftMonState(refBins.toIndexedSeq, refCount,
            lastFinal, days.toIndexedSeq,
            days.toIndexedSeq.map(pend(_).toIndexedSeq)))
          if (days.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              (days.head + 1) * bucketUs / 1000L,
              state.getCurrentWatermarkMs() + 1000L))
          out.iterator
      }
  }

  /** DuckDB twin generator: replay the monitor over a batch (day, bin,
    * cnt) relation — reference = the first `refDays` FINALIZED days in
    * day order, every later finalized day scored with the identical
    * truncated-integer statistic over the full [0, nBins) grid (absent
    * bins contribute through e_b or a_b alone, exactly as the
    * engine's dense arrays do). `finalizedSql` is a scalar subquery for
    * the exclusive upper time bound in microseconds (the one-shot
    * AvailableNow watermark = max event time). */
  def chi2DriftSql(dayBinCntSql: String, nBins: Int, refDays: Int,
      alarmE6: Long, finalizedUsSql: String,
      bucketUs: Long = 86400000000L): String =
    s"""WITH db AS ($dayBinCntSql),
       |fin AS (SELECT day, bin, cnt FROM db
       |        WHERE (day + 1) * $bucketUs <= ($finalizedUsSql)),
       |days AS (SELECT day, row_number() OVER (ORDER BY day) AS rk
       |         FROM (SELECT DISTINCT day FROM fin)),
       |ref AS (SELECT bin, CAST(sum(cnt) AS BIGINT) AS r
       |        FROM fin JOIN days USING (day)
       |        WHERE rk <= $refDays GROUP BY 1),
       |rtot AS (SELECT CAST(sum(r) AS BIGINT) AS rr FROM ref),
       |obs AS (SELECT day, bin, cnt FROM fin JOIN days USING (day)
       |        WHERE rk > $refDays),
       |nn AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS n FROM obs GROUP BY 1),
       |grid AS (SELECT nn.day, nn.n, CAST(b AS BIGINT) AS bin
       |         FROM nn, unnest(range(0, $nBins)) t(b)),
       |cells AS (
       |  SELECT g.day, g.n, g.bin,
       |    COALESCE(o.cnt, 0) AS a,
       |    CAST((COALESCE(ref.r, 0) * CAST(g.n AS HUGEINT)) // rtot.rr
       |      AS BIGINT) AS e
       |  FROM grid g
       |  LEFT JOIN obs o ON o.day = g.day AND o.bin = g.bin
       |  LEFT JOIN ref ON ref.bin = g.bin
       |  CROSS JOIN rtot),
       |scored AS (
       |  SELECT day, n,
       |    CAST(sum(CASE WHEN a + e > 0
       |      THEN (1000000 * CAST(a - e AS HUGEINT) * (a - e)) // (a + e)
       |      ELSE 0 END) AS BIGINT) AS chi2_e6
       |  FROM cells GROUP BY 1, 2)
       |SELECT day, n, chi2_e6, chi2_e6 > $alarmE6 AS alarm
       |FROM scored""".stripMargin
}
