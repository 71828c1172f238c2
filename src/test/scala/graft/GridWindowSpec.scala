package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{LayoutOps, PipelineOps, ProfileOps}

/** The grid (bucketed two-phase prefix-sum) forms of the previously
  * single-partition rank windows: [[ProfileOps.giniIndex]] and
  * [[PipelineOps.quantileNormalize]] must be BIT-IDENTICAL to their
  * global-window definitions while carrying no window that orders an
  * unbounded relation without a bucket partition. */
class GridWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  /** Every window whose ordering touches the row-level value column
    * must be partitioned (by the range bucket); unpartitioned windows
    * may exist only downstream of an aggregate (the bounded
    * bucket-totals offsets relation). */
  private def assertNoGlobalRowWindow(df: DataFrame,
      rowOrderCols: Seq[String]): Unit = {
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected window operators in the plan")
    wins.foreach { w =>
      val ordersRows = w.orderSpec.exists(o =>
        rowOrderCols.exists(c => o.child.toString.contains(c)))
      if (ordersRows && w.partitionSpec.isEmpty) {
        // allowed only if it runs over an aggregate (bounded totals)
        val overAggregate = w.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isDefined
        assert(overAggregate,
          s"single-partition window over the row relation survived: $w")
      }
    }
  }

  // reference (old) definitions — the spec the grid forms must equal
  private def giniGlobal(xs: Seq[Long]): org.apache.spark.sql.Row = {
    val g = xs.toDF("x").select(col("x").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("cb", coalesce(sum(col("cnt")).over(w), lit(0L)))
    cum.agg(
        sum(col("cnt")).as("n"),
        sum(col("v") * col("cnt")).as("sum_x"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          (lit(2L) * col("cb") + col("cnt") + lit(1L))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("r2x"))
      .select(col("n"), col("sum_x"),
        round(col("r2x").cast("double") /
          (col("n").cast("double") * col("sum_x").cast("double")) -
          (col("n") + lit(1L)).cast("double") / col("n").cast("double"), 6)
          .as("gini"))
      .collect()(0)
  }

  test("giniIndex grid == global-window definition, several bucket counts") {
    val rng = new scala.util.Random(7)
    // zipf-ish long tail plus a point mass plus negatives-free lengths
    val xs = Seq.fill(4000)(math.abs(rng.nextGaussian() * 900).toLong) ++
      Seq.fill(500)(42L) ++ (0L until 300L)
    val want = giniGlobal(xs)
    for (b <- Seq(2, 8, 64, 256)) {
      val got = ProfileOps.giniIndex(xs.toDF("x"), col("x"), buckets = b)
        .collect()(0)
      assert(got == want, s"buckets=$b: $got != $want")
    }
  }

  test("gridCumCounts plan: value-ordered windows are bucket-partitioned") {
    // giniIndex and fdHistogram both rank through gridCumCounts and
    // materialize their (one-row / <=maxBins-row) results eagerly, so
    // the window-shape assertion runs against the shared derivation
    val g = (0L until 500L).toDF("x").select(col("x").as("v"))
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    assertNoGlobalRowWindow(
      ProfileOps.gridCumCounts(g, 256), Seq("v"))
  }

  // reference (old) fdHistogram definition: exact quartiles via a
  // global row_number rank window — the 2^31-capped form the grid
  // replaced; bin arithmetic identical
  private def fdGlobal(xs: Seq[Long], maxBins: Int = 200): Seq[(Long, Long, Long, Long, Long)] = {
    val vals = xs.toDF("x").select(col("x").as("v"))
    val s = vals.agg(count(lit(1)).as("n"), min("v").as("mn"),
      max("v").as("mx")).head()
    val (n, mn, mx) = (s.getLong(0), s.getLong(1), s.getLong(2))
    val (r1, r3) = ((n + 3) / 4, (3 * n + 3) / 4)
    val qs = vals.withColumn("rn",
        row_number().over(Window.orderBy("v")).cast("long"))
      .filter(col("rn") === r1 || col("rn") === r3)
      .agg(min(when(col("rn") === r1, col("v"))).as("q1"),
        min(when(col("rn") === r3, col("v"))).as("q3")).head()
    val (q1, q3) = (qs.getLong(0), qs.getLong(1))
    val nb: Long =
      if (q3 <= q1 || mx == mn) 1L
      else math.min(maxBins.toLong, math.max(1L,
        math.ceil((mx - mn).toDouble /
          (2.0 * (q3 - q1).toDouble / math.cbrt(n.toDouble))).toLong))
    val idx =
      if (mx == mn) lit(0L)
      else expr(s"least(((v - ${mn}L) * ${nb}L) div ${mx - mn}L, ${nb - 1}L)")
    vals.select(idx.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), nb, q1, q3))
      .sortBy(_._1).toSeq
  }

  test("fdHistogram grid == global-rank definition, several bucket counts") {
    val rng = new scala.util.Random(13)
    // long tail + heavy point masses + a dense run: quartiles land both
    // inside tie groups and on group boundaries
    val xs = Seq.fill(3000)(math.abs(rng.nextGaussian() * 700).toLong) ++
      Seq.fill(800)(64L) ++ (0L until 400L) ++ Seq.fill(3)(99999L)
    val want = fdGlobal(xs)
    for (b <- Seq(2, 8, 64, 256)) {
      val got = ProfileOps.fdHistogram(xs.toDF("x"), col("x"), buckets = b)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1).toSeq
      assert(got == want, s"buckets=$b: $got != $want")
    }
  }

  test("giniIndex: empty and single-value inputs survive") {
    val empty = ProfileOps.giniIndex(Seq.empty[Long].toDF("x"), col("x"))
      .collect()
    assert(empty.length == 1 && empty(0).isNullAt(0)) // agg over nothing
    val one = ProfileOps.giniIndex(Seq(7L, 7L, 7L).toDF("x"), col("x"))
      .collect()(0)
    assert(one.getLong(0) == 3L && one.getDouble(2) == 0.0)
  }

  private def quantileNormalizeGlobal(df: DataFrame): Array[(Long, Long)] = {
    val base = df.select(col("doc_id").as("tie"), col("source").as("grp"),
      col("score").cast("long").as("score"))
    val w = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("score", "tie")).cast("long"))
      .withColumn("n_g", count(lit(1)).over(
        Window.partitionBy("grp")).cast("long"))
    val g = base.select(col("score").as("g_score"), col("tie"))
      .withColumn("gr", row_number().over(
        Window.orderBy("g_score", "tie")).cast("long"))
      .select("gr", "g_score")
    val n = base.count()
    w.withColumn("k",
        expr(s"((2L*rn - 1L) * ${n}L + 2L*n_g - 1L) div (2L*n_g)"))
      .join(g, col("k") === col("gr"))
      .select(col("tie"), col("g_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
  }

  test("quantileNormalize grid == global-window definition") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 3000L).map { i =>
      val src = s"s${i % 7}"
      // per-source shifted distributions with heavy ties
      (i, src, (rng.nextInt(40) + (i % 7) * 25).toLong)
    }
    val df = rows.toDF("doc_id", "source", "score")
    val want = quantileNormalizeGlobal(df)
    for (b <- Seq(2, 16, 256)) {
      val got = PipelineOps
        .quantileNormalize(df, "source", "score", "doc_id", buckets = b)
        .select("tie", "norm_score")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.sameElements(want), s"buckets=$b diverged")
    }
  }

  test("quantileNormalize plan: score-ordered windows are bucket-partitioned") {
    val df = (0L until 400L).map(i => (i, s"s${i % 3}", i % 50))
      .toDF("doc_id", "source", "score")
    val out = PipelineOps.quantileNormalize(df, "source", "score", "doc_id")
    assertNoGlobalRowWindow(out, Seq("score", "tie"))
    // and the group-side rank is (grp, bkt)-partitioned, not grp-only
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    wins.foreach { w =>
      if (w.orderSpec.exists(_.child.toString.contains("tie")))
        assert(w.partitionSpec.nonEmpty,
          s"row-level rank window must be bucket-partitioned: $w")
    }
  }

  test("rangePlan: empty input plans null bounds and returns no rows") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val out = LayoutOps.rangePlan(empty, col("k"), col("v"), buckets = 4)
    assert(out.collect().isEmpty)
  }

  test("rangeBucketOf is monotone and ties share buckets") {
    val df = (0L until 1000L).map(i => (i, (i % 97).toDouble)).toDF("k", "v")
    val bounds = LayoutOps.rangeBoundsDf(df, col("k"), col("v"), 16)
    val assigned = df.crossJoin(broadcast(bounds))
      .withColumn("bkt", LayoutOps.rangeBucketOf("v"))
      .select("v", "bkt").collect().map(r => (r.getDouble(0), r.getLong(1)))
    // monotone: sorting by value never decreases the bucket
    val byV = assigned.sortBy(_._1)
    assert(byV.sliding(2).forall {
      case Array(a, b) => a._2 <= b._2
      case _ => true
    })
    // equal values -> equal buckets
    assert(assigned.groupBy(_._1).values.forall(_.map(_._2).distinct.length == 1))
    // and the load actually spreads: >= 8 distinct buckets for 97 values
    assert(assigned.map(_._2).distinct.length >= 8)
  }
}
