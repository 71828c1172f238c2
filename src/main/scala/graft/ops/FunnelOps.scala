package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over user event streams: ordered funnels and
  * cohort retention — the standard product-analytics operators, built as
  * per-stage aggregates so nothing user-row-sized ever sorts globally.
  */
object FunnelOps {

  /** Ordered funnel: per stage k, the number of users who performed
    * stage-k's event type strictly AFTER their stage-(k-1) completion
    * time (first qualifying occurrence each). Stage 0 is each user's
    * earliest occurrence of the first type.
    *
    * Scale shape: each stage is a type-filtered scan (predicate pushed to
    * parquet) → groupBy(user) min-aggregate → equi-join on user against
    * the previous stage's (user, t) relation. Shuffles carry (user,
    * timestamp) pairs — user-cardinality, never event volume; there is no
    * per-user sort window (the alternative single-pass form) so one
    * hyperactive user costs nothing special.
    *
    * Returns (stage_idx, stage, n_users) — one row per stage. */
  def funnelCounts(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val perStage = scala.collection.mutable.ArrayBuffer(
      (0, stages.head, reached))
    stages.zipWithIndex.drop(1).foreach { case (s, i) =>
      reached = events.filter(col(typeCol) === s)
        .select(col(userCol), col(tsCol).as("__ts2"))
        .join(reached, Seq(userCol))
        .filter(col("__ts2") > col("__t"))
        .groupBy(col(userCol)).agg(min(col("__ts2")).as("__t"))
      perStage += ((i, s, reached))
    }
    perStage.map { case (i, s, d) =>
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(s).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB twin of [[funnelCounts]] over the events table. Stage names
    * are caller-supplied — single quotes are escaped so a name like
    * "add'l" cannot break (or change the meaning of) the emitted SQL. */
  def funnelCountsSql(rawStages: Seq[String]): String = {
    val stages = rawStages.map(_.replace("'", "''"))
    val ctes = stages.zipWithIndex.map { case (s, i) =>
      if (i == 0)
        s"""s0 AS (
           |  SELECT user_id, min(ts_us) AS t FROM e
           |  WHERE event_type = '$s' GROUP BY 1)"""
      else
        s"""s$i AS (
           |  SELECT e.user_id, min(e.ts_us) AS t
           |  FROM e JOIN s${i - 1} p
           |    ON e.user_id = p.user_id AND e.ts_us > p.t
           |  WHERE e.event_type = '$s' GROUP BY 1)"""
    }.mkString(",\n")
    val sel = stages.zipWithIndex.map { case (s, i) =>
      s"SELECT $i AS stage_idx, '$s' AS stage, " +
        s"CAST((SELECT count(*) FROM s$i) AS BIGINT) AS n_users"
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       |    event_type
       |  FROM events),
       |$ctes
       |$sel""".stripMargin
  }

  /** Cohort retention: cohort = the time bucket of a user's first
    * activity; cell (cohort, offset) counts distinct users from that
    * cohort active `offset` buckets later. Integer bucket arithmetic —
    * deterministic and engine-portable.
    *
    * Scale: first-activity and per-bucket-activity are both
    * user-cardinality aggregates of the event scan; the retention join
    * moves (user, bucket) pairs only. */
  def retentionCohorts(events: DataFrame, bucketUs: Long, maxOffset: Int,
      userCol: String = "user_id", tsCol: String = "ts_us"): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(maxOffset >= 0, "maxOffset must be >= 0")
    // integer floor-div (Spark `div` == DuckDB `//` for the non-negative
    // epoch range), not `/`-then-cast which truncates toward zero
    val b = expr(s"`$tsCol` div ${bucketUs}L")
    val first = events.groupBy(col(userCol)).agg(min(b).as("cohort"))
    val activity = events.select(col(userCol), b.as("__b")).distinct()
    activity.join(first, Seq(userCol))
      .withColumn("offset", col("__b") - col("cohort"))
      .filter(col("offset") >= 0 && col("offset") <= maxOffset)
      .groupBy("cohort", "offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** DuckDB twin of [[retentionCohorts]] over the events table. */
  def retentionCohortsSql(bucketUs: Long, maxOffset: Int): String =
    s"""WITH e AS (
       |  SELECT user_id,
       |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // $bucketUs AS BIGINT) AS b
       |  FROM events),
       |f AS (SELECT user_id, min(b) AS cohort FROM e GROUP BY 1),
       |a AS (SELECT DISTINCT user_id, b FROM e)
       |SELECT f.cohort, a.b - f.cohort AS "offset",
       |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
       |FROM a JOIN f ON a.user_id = f.user_id
       |WHERE a.b - f.cohort BETWEEN 0 AND $maxOffset
       |GROUP BY 1, 2""".stripMargin
}
