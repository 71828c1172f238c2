package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Declarative data-quality constraint verification (deequ-style): a
  * suite of checks over one relation compiled into a BOUNDED number of
  * scans, emitting one (constraint, observed metric, pass/fail) row per
  * check. The "expectations" gate every production ingest runs before a
  * snapshot is allowed into training — and, like profiling, the op
  * that's catastrophically wrong to run as one scan per check.
  *
  * Scale design (the [[ProfileOps]] lessons applied):
  *  - All metrics compile into ONE `agg(...)` over one scan when every
  *    aggregate has a mutable buffer (counts, conditional counts, exact
  *    NDV, double extrema). `MeanBetween` adds DECIMAL(38,6) sums —
  *    immutable buffers that, combined with a multi-distinct Expand,
  *    drag the expanded relation through SortAggregate (the measured
  *    5.5× cliff in ProfileOps). Decimal sums therefore go to a SECOND
  *    column-pruned aggregate cross-joined as one-row results; scans
  *    stay ≤ 2 regardless of suite size (plan-asserted in the spec).
  *  - `Uniqueness`/`Distinctness` use exact `count_distinct` — the
  *    oracle-parity choice. At 100 TB, exact NDV on a non-key column is
  *    the expensive part (×(C+1) Expand); route approximate suites
  *    through [[graft.functions.HllAgg]] as ProfileOps' approx mode
  *    does when a banded check suffices.
  *  - Ratios divide exact longs as doubles and round 6dp; means divide
  *    the exact decimal sum — order-independent, bit-identical across
  *    partitionings and engines (no double-summation-order flake).
  *  - [[referentialIntegrity]] is the one check a single scan can't
  *    express: an anti-join against the parent keys, counting orphans.
  *    The parent side is distinct-projected to keys only; at dim-table
  *    sizes AQE broadcasts it, at fact-to-fact sizes it degrades to a
  *    key-partitioned shuffle join — never a cartesian.
  *
  * Output schema (long-form, one row per constraint):
  * (relation, cid, check_id, col_name, observed, lo, hi, passed) where
  * `observed` is the 6dp-rounded metric and `passed` =
  * lo ≤ observed ≤ hi with NULL bounds meaning unbounded and a NULL
  * observed (empty input) failing loudly.
  *
  * Reference scope note: the reference engine (dask-histogram) has no
  * validation surface; this operator exists for the 100 TB curation
  * pipeline role (see SURVEY.md extension scope).
  */
object ConstraintOps {

  sealed trait Constraint
  /** count(col)/count(*) >= minRatio. */
  final case class Completeness(column: String, minRatio: Double) extends Constraint
  /** Exact NDV == nonnull count (a key column). */
  final case class Uniqueness(column: String) extends Constraint
  /** Exact NDV / nonnull >= minRatio. */
  final case class Distinctness(column: String, minRatio: Double) extends Constraint
  /** min(col) >= lo (timestamps compare as epoch microseconds). */
  final case class MinGe(column: String, lo: Double) extends Constraint
  /** max(col) <= hi (timestamps compare as epoch microseconds). */
  final case class MaxLe(column: String, hi: Double) extends Constraint
  /** lo <= mean(col) <= hi via exact DECIMAL(38,6) sum. */
  final case class MeanBetween(column: String, lo: Double, hi: Double) extends Constraint
  /** Zero non-null values outside `allowed`. */
  final case class InSet(column: String, allowed: Seq[String]) extends Constraint
  /** Fraction of non-null values matching `regex` >= minRatio
    * (partial-match semantics — anchor the pattern for full match;
    * keep to the RE2-ish common subset both engines share). */
  final case class PatternRatio(column: String, regex: String, minRatio: Double) extends Constraint
  /** lo <= count(*) <= hi. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Constraint

  private def checkId(c: Constraint): String = c match {
    case _: Completeness => "completeness"
    case _: Uniqueness => "uniqueness"
    case _: Distinctness => "distinctness"
    case _: MinGe => "min_ge"
    case _: MaxLe => "max_le"
    case _: MeanBetween => "mean_between"
    case _: InSet => "in_set"
    case _: PatternRatio => "pattern_ratio"
    case _: RowCountBetween => "row_count"
  }

  private def colOf(c: Constraint): String = c match {
    case Completeness(col, _) => col
    case Uniqueness(col) => col
    case Distinctness(col, _) => col
    case MinGe(col, _) => col
    case MaxLe(col, _) => col
    case MeanBetween(col, _, _) => col
    case InSet(col, _) => col
    case PatternRatio(col, _, _) => col
    case _: RowCountBetween => "*"
  }

  private def bounds(c: Constraint): (Option[Double], Option[Double]) = c match {
    case Completeness(_, t) => (Some(t), None)
    case Uniqueness(_) => (Some(1.0), Some(1.0))
    case Distinctness(_, t) => (Some(t), None)
    case MinGe(_, lo) => (Some(lo), None)
    case MaxLe(_, hi) => (None, Some(hi))
    case MeanBetween(_, lo, hi) => (Some(lo), Some(hi))
    case InSet(_, _) => (Some(0.0), Some(0.0))
    case PatternRatio(_, _, t) => (Some(t), None)
    case RowCountBetween(lo, hi) => (Some(lo.toDouble), Some(hi.toDouble))
  }

  /** Numeric view of a column for extrema/means: timestamps as epoch
    * microseconds (the repo-wide portable temporal key), numerics as
    * double. */
  private def numCol(f: StructField): Column = f.dataType match {
    case TimestampType | TimestampNTZType =>
      unix_micros(col(f.name).cast("timestamp")).cast("double")
    case _ => col(f.name).cast("double")
  }

  private def numColSql(f: StructField): String = f.dataType match {
    case TimestampType | TimestampNTZType =>
      s"CAST(epoch_us(CAST(${f.name} AS TIMESTAMP)) AS DOUBLE)"
    case _ => s"CAST(${f.name} AS DOUBLE)"
  }

  /** Decimal view for order-independent exact sums (timestamps sum
    * their epoch micros — exact integers well inside 38 digits). */
  private def decCol(f: StructField): Column = f.dataType match {
    case TimestampType | TimestampNTZType =>
      unix_micros(col(f.name).cast("timestamp")).cast(DecimalType(38, 6))
    case _ => col(f.name).cast(DecimalType(38, 6))
  }

  private def decColSql(f: StructField): String = f.dataType match {
    case TimestampType | TimestampNTZType =>
      s"CAST(epoch_us(CAST(${f.name} AS TIMESTAMP)) AS DECIMAL(38,6))"
    case _ => s"CAST(${f.name} AS DECIMAL(38,6))"
  }

  /** Metric slots a suite needs, deduplicated: the same `nn:col` feeds
    * every constraint that reads it. `hash` metrics have mutable
    * aggregation buffers (safe beside a multi-distinct Expand); `sort`
    * metrics (decimal sums) must stay out of that aggregate. */
  private final case class MetricPlan(
      hash: mutable.LinkedHashMap[String, Column],
      sorted: mutable.LinkedHashMap[String, Column])

  private def planMetrics(schema: StructType, cs: Seq[Constraint]): MetricPlan = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    def fld(n: String): StructField = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"constraint references unknown column '$n' (have: ${schema.fieldNames.mkString(", ")})"))
    val h = mutable.LinkedHashMap.empty[String, Column]
    val s = mutable.LinkedHashMap.empty[String, Column]
    h.put("total", count(lit(1)))
    cs.zipWithIndex.foreach { case (c, i) =>
      c match {
        case Completeness(n, _) =>
          h.getOrElseUpdate(s"nn_$n", count(col(n)))
        case Uniqueness(n) =>
          h.getOrElseUpdate(s"nn_$n", count(col(n)))
          h.getOrElseUpdate(s"ndv_$n", count_distinct(col(n)))
        case Distinctness(n, _) =>
          h.getOrElseUpdate(s"nn_$n", count(col(n)))
          h.getOrElseUpdate(s"ndv_$n", count_distinct(col(n)))
        case MinGe(n, _) =>
          h.getOrElseUpdate(s"min_$n", min(numCol(fld(n))))
        case MaxLe(n, _) =>
          h.getOrElseUpdate(s"max_$n", max(numCol(fld(n))))
        case MeanBetween(n, _, _) =>
          h.getOrElseUpdate(s"nn_$n", count(col(n)))
          s.getOrElseUpdate(s"sum_$n", sum(decCol(fld(n))))
        case InSet(n, allowed) =>
          h.getOrElseUpdate(s"viol_$i",
            count(when(col(n).isNotNull && !col(n).isin(allowed: _*), lit(1))))
        case PatternRatio(n, re, _) =>
          h.getOrElseUpdate(s"nn_$n", count(col(n)))
          h.getOrElseUpdate(s"re_$i", count(when(col(n).rlike(re), lit(1))))
        case RowCountBetween(_, _) => ()
      }
    }
    MetricPlan(h, s)
  }

  /** Observed-metric expression for constraint `c` (index `i` in the
    * suite) over the one-row metric relation. 6dp-rounded where the
    * metric is a ratio or a mean; extrema and counts are exact. */
  private def observed(c: Constraint, i: Int): Column = c match {
    case Completeness(n, _) =>
      round(col(s"nn_$n").cast("double") / col("total"), 6)
    case Uniqueness(n) =>
      round(col(s"ndv_$n").cast("double") / col(s"nn_$n"), 6)
    case Distinctness(n, _) =>
      round(col(s"ndv_$n").cast("double") / col(s"nn_$n"), 6)
    case MinGe(n, _) => col(s"min_$n")
    case MaxLe(n, _) => col(s"max_$n")
    case MeanBetween(n, _, _) =>
      round(col(s"sum_$n").cast("double") / col(s"nn_$n"), 6)
    case InSet(_, _) => col(s"viol_$i").cast("double")
    case PatternRatio(n, _, _) =>
      round(col(s"re_$i").cast("double") / col(s"nn_$n"), 6)
    case RowCountBetween(_, _) => col("total").cast("double")
  }

  private def observedSql(c: Constraint, i: Int): String = c match {
    case Completeness(n, _) =>
      s"round(CAST(nn_$n AS DOUBLE) / total, 6)"
    case Uniqueness(n) =>
      s"round(CAST(ndv_$n AS DOUBLE) / nn_$n, 6)"
    case Distinctness(n, _) =>
      s"round(CAST(ndv_$n AS DOUBLE) / nn_$n, 6)"
    case MinGe(n, _) => s"min_$n"
    case MaxLe(n, _) => s"max_$n"
    case MeanBetween(n, _, _) =>
      s"round(CAST(sum_$n AS DOUBLE) / nn_$n, 6)"
    case InSet(_, _) => s"CAST(viol_$i AS DOUBLE)"
    case PatternRatio(n, _, _) =>
      s"round(CAST(re_$i AS DOUBLE) / nn_$n, 6)"
    case RowCountBetween(_, _) => s"CAST(total AS DOUBLE)"
  }

  /** Run the suite: ≤ 2 scans (1 when no `MeanBetween`), one output row
    * per constraint in suite order (`cid`). */
  def check(df: DataFrame, relation: String, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "empty constraint suite")
    val plan = planMetrics(df.schema, cs)
    val hashRow = df.agg(plan.hash.head._2.as(plan.hash.head._1),
      plan.hash.tail.map { case (k, v) => v.as(k) }.toSeq: _*)
    val metricRow =
      if (plan.sorted.isEmpty) hashRow
      else {
        // immutable decimal buffers get their own column-pruned
        // aggregate — keeping them out of the multi-distinct Expand
        // branch (the ProfileOps SortAggregate cliff)
        val sortRow = df.agg(plan.sorted.head._2.as(plan.sorted.head._1),
          plan.sorted.tail.map { case (k, v) => v.as(k) }.toSeq: _*)
        hashRow.crossJoin(sortRow)
      }
    val rows = cs.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = bounds(c)
      val loCol = lo.map(lit(_).cast("double")).getOrElse(lit(null).cast("double"))
      val hiCol = hi.map(lit(_).cast("double")).getOrElse(lit(null).cast("double"))
      val obs = observed(c, i).cast("double")
      struct(
        lit(relation).as("relation"),
        lit(i).as("cid"),
        lit(checkId(c)).as("check_id"),
        lit(colOf(c)).as("col_name"),
        obs.as("observed"),
        loCol.as("lo"),
        hiCol.as("hi"),
        coalesce(
          (loCol.isNull || obs >= loCol) && (hiCol.isNull || obs <= hiCol),
          lit(false)).as("passed"))
    }
    metricRow.select(inline(array(rows: _*)))
  }

  /** DuckDB twin of [[check]] — same metric relation, same observed
    * expressions, same 6dp rounding. `schema` drives the same
    * timestamp-vs-numeric dispatch the engine reads from parquet. */
  def checkSql(table: String, relation: String, schema: StructType,
      cs: Seq[Constraint]): String = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    def fld(n: String): StructField = byName(n)
    val metrics = mutable.LinkedHashMap.empty[String, String]
    metrics.put("total", "count(*)")
    cs.zipWithIndex.foreach { case (c, i) =>
      c match {
        case Completeness(n, _) => metrics.getOrElseUpdate(s"nn_$n", s"count($n)")
        case Uniqueness(n) =>
          metrics.getOrElseUpdate(s"nn_$n", s"count($n)")
          metrics.getOrElseUpdate(s"ndv_$n", s"count(DISTINCT $n)")
        case Distinctness(n, _) =>
          metrics.getOrElseUpdate(s"nn_$n", s"count($n)")
          metrics.getOrElseUpdate(s"ndv_$n", s"count(DISTINCT $n)")
        case MinGe(n, _) =>
          metrics.getOrElseUpdate(s"min_$n", s"min(${numColSql(fld(n))})")
        case MaxLe(n, _) =>
          metrics.getOrElseUpdate(s"max_$n", s"max(${numColSql(fld(n))})")
        case MeanBetween(n, _, _) =>
          metrics.getOrElseUpdate(s"nn_$n", s"count($n)")
          metrics.getOrElseUpdate(s"sum_$n", s"sum(${decColSql(fld(n))})")
        case InSet(n, allowed) =>
          val set = allowed.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
          metrics.getOrElseUpdate(s"viol_$i",
            s"count(CASE WHEN $n IS NOT NULL AND $n NOT IN ($set) THEN 1 END)")
        case PatternRatio(n, re, _) =>
          metrics.getOrElseUpdate(s"nn_$n", s"count($n)")
          val esc = re.replace("'", "''")
          metrics.getOrElseUpdate(s"re_$i",
            s"count(CASE WHEN regexp_matches($n, '$esc') THEN 1 END)")
        case RowCountBetween(_, _) => ()
      }
    }
    def fmtBound(v: Option[Double]): String = v match {
      case Some(d) => s"CAST(${d.toString} AS DOUBLE)"
      case None => "CAST(NULL AS DOUBLE)"
    }
    val metricSelect = metrics.map { case (k, e) => s"$e AS $k" }.mkString(",\n    ")
    val rows = cs.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = bounds(c)
      s"""SELECT '${relation}' AS relation, CAST($i AS INT) AS cid,
         |  '${checkId(c)}' AS check_id, '${colOf(c)}' AS col_name,
         |  CAST(${observedSql(c, i)} AS DOUBLE) AS observed,
         |  ${fmtBound(lo)} AS lo, ${fmtBound(hi)} AS hi,
         |  coalesce((${fmtBound(lo)} IS NULL OR CAST(${observedSql(c, i)} AS DOUBLE) >= ${fmtBound(lo)})
         |    AND (${fmtBound(hi)} IS NULL OR CAST(${observedSql(c, i)} AS DOUBLE) <= ${fmtBound(hi)}),
         |    false) AS passed
         |FROM m""".stripMargin
    }
    s"""WITH m AS (SELECT
       |    $metricSelect
       |  FROM $table)
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Referential integrity: every non-null `fkCol` in `child` appears
    * as `pkCol` in `parent`. One row: observed = orphan count. The
    * parent side projects to distinct keys before the anti-join —
    * broadcast at dim sizes (AQE), key-partitioned shuffle at
    * fact-to-fact sizes; never a cartesian. */
  def referentialIntegrity(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String, relation: String): DataFrame = {
    val orphans = child.select(col(fkCol)).filter(col(fkCol).isNotNull)
      .join(parent.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
    orphans.agg(count(lit(1)).as("viol")).select(
      lit(relation).as("relation"),
      lit(0).as("cid"),
      lit("fk_in_pk").as("check_id"),
      lit(s"$fkCol->$pkCol").as("col_name"),
      col("viol").cast("double").as("observed"),
      lit(0.0).as("lo"), lit(0.0).as("hi"),
      (col("viol") === 0).as("passed"))
  }

  /** DuckDB twin of [[referentialIntegrity]]. */
  def referentialIntegritySql(childTable: String, fkCol: String,
      parentTable: String, pkCol: String, relation: String): String =
    s"""SELECT '$relation' AS relation, CAST(0 AS INT) AS cid,
       |  'fk_in_pk' AS check_id, '$fkCol->$pkCol' AS col_name,
       |  CAST((SELECT count(*) FROM $childTable c
       |        WHERE c.$fkCol IS NOT NULL AND NOT EXISTS
       |          (SELECT 1 FROM $parentTable p WHERE p.$pkCol = c.$fkCol))
       |    AS DOUBLE) AS observed,
       |  CAST(0.0 AS DOUBLE) AS lo, CAST(0.0 AS DOUBLE) AS hi,
       |  (SELECT count(*) FROM $childTable c
       |   WHERE c.$fkCol IS NOT NULL AND NOT EXISTS
       |     (SELECT 1 FROM $parentTable p WHERE p.$pkCol = c.$fkCol)) = 0 AS passed""".stripMargin
}
