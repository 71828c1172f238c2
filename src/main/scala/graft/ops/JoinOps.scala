package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shape utilities for skewed data — the join-side complement to
  * [[DedupOps.exactDedupSalted]]'s skewed aggregation.
  */
object JoinOps {

  /** Salted inner equi-join for a SKEWED left side: a hot key (one user
    * with 10^8 events, one viral document) sends every matching left row
    * to ONE reducer in a plain shuffle join. Salting splits each left
    * key's rows across `salts` sub-keys and replicates the right side
    * once per salt, so the hot key's rows spread over `salts` reducers.
    * Result is EXACTLY the plain inner join (every left row still meets
    * every matching right row — its salt's replica).
    *
    * Cost: right side is scanned/shuffled `salts` times — use when the
    * right side is far smaller than the hot key's row count but too big
    * to broadcast (the broadcast join is the better answer below that,
    * and AQE's skew-join handles the sort-merge case when it can; this
    * operator is the explicit, planner-independent form).
    *
    * The salt is a DETERMINISTIC hash of the left row's content (not
    * `monotonically_increasing_id`, which changes across partial stage
    * retries — an indeterminate shuffle key risks lost/duplicated rows
    * when only some map tasks are recomputed, the SPARK-23207 class of
    * bug). Identical rows share a salt; that residual skew is bounded by
    * the multiplicity of fully-identical rows. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltCol = "__graft_join_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"inputs must not already carry a $saltCol column")
    val sl = left.withColumn(saltCol,
      pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong)))
    val sr = right.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    sl.join(sr, Seq(key, saltCol)).drop(saltCol)
  }

  /** As-of join: for every left row, attach the LATEST right row of the
    * same `key` with `right.tsCol <= left.tsCol` (and, if `tolerance` is
    * given, `>= left.ts - tolerance`) — the standard point-in-time
    * enrichment (market data, feature stores, last-touch attribution).
    *
    * Spark-first plan: NOT a range join (a `<=` theta-join plans as
    * BroadcastNestedLoop) — instead the classic union-scan form: tag both
    * sides, union, ONE shuffle on `key`, one per-key sort, and a running
    * `last(payload, ignoreNulls)` window carries the most recent right row
    * forward onto each left row. Cost is a single Exchange + sort of
    * (left + right), independent of match distances; a hot key serializes
    * into one reducer's sort (same caveat family as sessionization —
    * acceptable for per-user/per-instrument keys, not for a global key).
    *
    * The right payload rides as ONE struct so all matched columns come
    * from the SAME right row even when some payload values are null.
    * Ties: a right row at exactly left.ts matches (`<=`); among right rows
    * sharing (key, ts) the largest `tieBreak` wins deterministically —
    * required, since shuffle order is not stable across retries.
    *
    * `tsCol`s must be numeric and non-negative (epoch micros; callers
    * convert timestamps). Left columns pass through unchanged; matched
    * payload columns keep their right-side names (must not collide). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    val payCols = rightTs +: payload
    // the emitted columns are payCols (rightTs INCLUDED) — both sides
    // calling their timestamp "ts" would otherwise silently produce a
    // duplicate output column name and break downstream by-name access
    val collisions = left.columns.toSet.intersect(payCols.toSet)
    require(collisions.isEmpty,
      s"emitted right columns collide with left columns: $collisions — rename first")
    val r = right.select(col(key), col(rightTs).cast("long").as("__ts"),
      lit(0).as("__side"), col(tieBreak).cast("long").as("__tb"),
      struct(payCols.map(col): _*).as("__pay"),
      lit(null).cast(structType(left, left.columns)).as("__lrow"))
    val l = left.select(col(key), col(leftTs).cast("long").as("__ts"),
      lit(1).as("__side"), lit(0L).as("__tb"),
      lit(null).cast(structType(right, payCols)).as("__pay"),
      struct(left.columns.map(col): _*).as("__lrow"))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__pay"), ignoreNulls = true).over(w)
    val inTol = tolerance match {
      case Some(t) => when(col("__m").isNotNull &&
        col("__m").getField(rightTs) >= col("__ts") - lit(t), col("__m"))
      case None => col("__m")
    }
    r.unionByName(l)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .withColumn("__m", inTol)
      .select(left.columns.toSeq.map(c => col("__lrow").getField(c).as(c)) ++
        payCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  /** Interval (range) join: points to enclosing intervals,
    * `lo <= point <= hi`, optionally also equi-matched on `keys`. Spark
    * plans a raw inequality join as BroadcastNestedLoop (quadratic, and
    * driver-bound by the broadcast); this operator grids both sides on
    * `bucketWidth` so it becomes a plain shuffled EQUI-join: each interval
    * replicates to the buckets it overlaps (`sequence(lo div w, hi div w)`
    * — bounded by interval span / width), each point lives in exactly ONE
    * bucket, so every qualifying (interval, point) pair meets exactly once
    * and no dedup is needed after the `BETWEEN` post-filter.
    *
    * Choose `bucketWidth` ≈ the typical interval span: replication factor
    * is span/width + 1, while too-wide buckets inflate the post-filter's
    * false candidates. Values must be non-negative longs (`div` truncates
    * toward zero, which is floor only for non-negatives — epoch micros
    * qualify). Column sets must be disjoint apart from `keys`. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = "__graft_range_bucket"
    val p = points.withColumn(b, expr(s"`$pointCol` div ${bucketWidth}L"))
    // reject inverted intervals up front: sequence(lo, hi) with hi < lo
    // generates a DESCENDING bucket list, silently replicating a
    // never-matching interval to every bucket it "spans" — wasted shuffle
    // rows and a masked data-quality bug. An inverted interval can match
    // no point, so the explicit pre-filter preserves results exactly.
    val iv = intervals.filter(col(loCol) <= col(hiCol)).withColumn(b, explode(sequence(
      expr(s"`$loCol` div ${bucketWidth}L"), expr(s"`$hiCol` div ${bucketWidth}L"))))
    p.join(iv, keys :+ b)
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop(b)
  }

  /** Join-strategy advisor: the ONE-ROW statistics report that decides
    * how to run an expensive equi-join BEFORE paying for it — row
    * counts, exact key NDVs, the hottest key's share on each side
    * (BIGINT ppm), and key containment (what fraction of left's
    * distinct keys the right side actually has — a low number means
    * the join is also a filter and a pre-join semi-filter pays off).
    * The `decision` column applies the standard playbook:
    * either side under `broadcastRowLimit` → broadcast it; else a top
    * key over `skewSharePpm` on either side → salt or AQE skew-split
    * ([[saltedJoin]]); else plain shuffle join.
    *
    * 100 TB shape: two independent single-pass aggregates (count +
    * count_distinct + max-key-count via a per-key count then a max —
    * all map-side combining) and one distinct-key semi-join for
    * containment; the report itself is one row. This codifies what
    * [[graft.ops.ProfileOps.keySkew]] + row counts tell a human — as
    * an operator, so pipelines can gate on it. */
  def joinAdvisor(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, broadcastRowLimit: Long = 1000000L,
      skewSharePpm: Long = 50000L): DataFrame = {
    def sideStats(df: DataFrame, key: String, p: String) = {
      val perKey = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      perKey.agg(sum("c").as(s"${p}_rows"),
        count(lit(1)).as(s"${p}_ndv"), max("c").as(s"${p}_top"))
    }
    val l = sideStats(left, leftKey, "l")
    val r = sideStats(right, rightKey, "r")
    val contained = left.select(col(leftKey).as("k")).distinct()
      .join(right.select(col(rightKey).as("k")).distinct(), Seq("k"),
        "left_semi")
      .agg(count(lit(1)).as("l_keys_in_r"))
    l.crossJoin(r).crossJoin(contained)
      .select(col("l_rows"), col("r_rows"), col("l_ndv"), col("r_ndv"),
        expr("(l_top * 1000000L) div l_rows").as("l_top_share_ppm"),
        expr("(r_top * 1000000L) div r_rows").as("r_top_share_ppm"),
        expr("(l_keys_in_r * 1000000L) div l_ndv").as("containment_ppm"),
        expr(s"""CASE
          WHEN r_rows <= ${broadcastRowLimit}L THEN 'broadcast_right'
          WHEN l_rows <= ${broadcastRowLimit}L THEN 'broadcast_left'
          WHEN (l_top * 1000000L) div l_rows >= ${skewSharePpm}L
            OR (r_top * 1000000L) div r_rows >= ${skewSharePpm}L
            THEN 'salt_or_aqe_skew'
          ELSE 'shuffle' END""").as("decision"))
  }

  /** DuckDB twin of [[joinAdvisor]]. */
  def joinAdvisorSql(leftTable: String, rightTable: String,
      leftKey: String, rightKey: String, broadcastRowLimit: Long = 1000000L,
      skewSharePpm: Long = 50000L): String =
    s"""WITH lk AS (SELECT $leftKey AS k, count(*) AS c
       |            FROM $leftTable GROUP BY 1),
       |rk AS (SELECT $rightKey AS k, count(*) AS c
       |       FROM $rightTable GROUP BY 1),
       |l AS (SELECT CAST(sum(c) AS BIGINT) AS l_rows, count(*) AS l_ndv,
       |        CAST(max(c) AS BIGINT) AS l_top FROM lk),
       |r AS (SELECT CAST(sum(c) AS BIGINT) AS r_rows, count(*) AS r_ndv,
       |        CAST(max(c) AS BIGINT) AS r_top FROM rk),
       |ct AS (SELECT count(*) AS l_keys_in_r FROM lk
       |       WHERE k IN (SELECT k FROM rk))
       |SELECT l_rows, r_rows, l_ndv, r_ndv,
       |  (l_top * 1000000) // l_rows AS l_top_share_ppm,
       |  (r_top * 1000000) // r_rows AS r_top_share_ppm,
       |  (l_keys_in_r * 1000000) // l_ndv AS containment_ppm,
       |  CASE
       |    WHEN r_rows <= $broadcastRowLimit THEN 'broadcast_right'
       |    WHEN l_rows <= $broadcastRowLimit THEN 'broadcast_left'
       |    WHEN (l_top * 1000000) // l_rows >= $skewSharePpm
       |      OR (r_top * 1000000) // r_rows >= $skewSharePpm
       |      THEN 'salt_or_aqe_skew'
       |    ELSE 'shuffle' END AS decision
       |FROM l, r, ct""".stripMargin
}
