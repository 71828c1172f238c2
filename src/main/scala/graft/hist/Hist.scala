package graft.hist

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** One staged fill: which DataFrame/columns feed the histogram, with
  * optional weight and sample (reference stages dicts of
  * (args, weight, sample) at `/root/reference/src/dask_histogram/boost.py:234-312`).
  * Scalar weights broadcast via `lit` (ref: `tests/test_core.py:350-359`);
  * scalar category args ride along as `lit` columns
  * (ref: `tests/test_boost.py:132-134`).
  */
final case class FillSpec(df: DataFrame, cols: Seq[Column],
    weight: Option[Column] = None, sample: Option[Column] = None)

/** Core fill + reduce engine.
  *
  * The reference's whole pipeline — per-partition `bh.Histogram.fill`
  * (`core.py:63-257`) followed by a bounded-fan-in tree reduction
  * (`core.py:856-885`) — is one declarative Spark aggregation here:
  * `select(binIndex*) .groupBy(idx*) .agg(storage sums)`. Catalyst plans it
  * as partial HashAggregate (map-side combine ≈ per-partition fill) +
  * shuffle of bin rows only + final HashAggregate (≈ tree reduce); only
  * histograms move across the wire, never rows — the reference's key design
  * property, preserved (SURVEY.md §4).
  */
object Hist {

  /** Fill one histogram from columns of a DataFrame → sparse H. */
  def fill(spec: HistSpec, df: DataFrame, cols: Seq[Column],
      weight: Option[Column] = None, sample: Option[Column] = None): DataFrame =
    fillMulti(spec, Seq(FillSpec(df, cols, weight, sample)))

  /** Project one FillSpec to the pre-aggregation shape
    * ([prefix cols,] i0..iD, w, s). Narrow (no shuffle) — whole-stage
    * codegen fuses scan + bin index. */
  private def project(spec: HistSpec, f: FillSpec,
      prefix: Seq[Column] = Nil): DataFrame = {
    require(f.cols.size == spec.ndim,
      s"fill needs ${spec.ndim} coordinate columns, got ${f.cols.size}")
    // boost rejects Mean/WeightedMean fills without sample=; defaulting the
    // sample to 0.0 would yield silently-wrong all-zero means
    require(f.sample.isDefined || !spec.storage.usesSample,
      s"${spec.storage} requires a sample column")
    val idx = spec.axes.zip(f.cols).zipWithIndex.map { case ((ax, c), i) =>
      ax.binCol(c).as(s"i$i")
    }
    val w = f.weight.getOrElse(lit(1.0)).cast(DoubleType).as("__w")
    val s = f.sample.getOrElse(lit(0.0)).cast(DoubleType).as("__s")
    f.df.select(prefix ++ idx ++ Seq(w, s): _*)
  }

  /** Multi-fill fused into ONE aggregation pass (reference fuses K staged
    * fills into one task per partition, `core.py:409-434`, `:978-1005`):
    * union of narrow projections → single groupBy → one shuffle total. */
  def fillMulti(spec: HistSpec, fills: Seq[FillSpec]): DataFrame = {
    require(fills.nonEmpty, "at least one fill required")
    val projected = fills.map(project(spec, _)).reduce(_ unionByName _)
    val aggs = spec.storage.aggs(col("__w"), col("__s"))
    val base = projected
      .groupBy(spec.indexCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    spec.storage.finalizers.foldLeft(base) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  /** Partial (per-partition) histograms — the reference's
    * `partitioned_factory` (`core.py:1313-1344`): expose pre-reduction
    * state keyed by the physical partition id. The bucket column is
    * evaluated in the same narrow stage as the projection, so ids match
    * the scan's partitioning. */
  def fillPartitioned(spec: HistSpec, df: DataFrame, cols: Seq[Column],
      weight: Option[Column] = None, sample: Option[Column] = None): DataFrame =
    fillPartitionedBy(spec, df, spark_partition_id().cast("long"), cols,
      weight, sample)

  /** As [[fillPartitioned]] but keyed by a caller-supplied deterministic
    * bucket expression — same pre-reduction surface, reproducible across
    * engines/runs (physical partition ids depend on scheduling). */
  def fillPartitionedBy(spec: HistSpec, df: DataFrame, bucket: Column,
      cols: Seq[Column], weight: Option[Column] = None,
      sample: Option[Column] = None): DataFrame = {
    val aggs = spec.storage.aggs(col("__w"), col("__s"))
    project(spec, FillSpec(df, cols, weight, sample), Seq(bucket.as("partition")))
      .groupBy((col("partition") +: spec.indexCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Densify a sparse histogram: full (n[+2])^D grid with zero-filled
    * missing bins (reference `to_dask_array`, `core.py:1098-1154`).
    * Numeric axes only. Grid built from tiny `spark.range` cross joins
    * (size = bin count, not data size) and broadcast-joined to H. */
  def densify(spec: HistSpec, h: DataFrame, flow: Boolean = true): DataFrame = {
    require(axesNumeric(spec), "densify requires numeric (indexed) axes")
    val spark = h.sparkSession
    val grid = spec.axes.zipWithIndex.map { case (a, i) =>
      val (lo, hi) = if (flow) (0L, a.nBins + 2L) else (1L, a.nBins + 1L)
      spark.range(lo, hi).toDF(s"i$i")
    }.reduce(_ crossJoin _)
    val joined = grid.join(h, spec.indexCols, "left")
    val zeroed = spec.storage.stateCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0.0).cast(d.schema(c).dataType)))
    }
    zeroed.select((spec.indexCols.map(col) ++ spec.storage.stateCols.map(col)): _*)
  }

  private def axesNumeric(spec: HistSpec): Boolean = spec.axes.forall(!_.isCategorical)

  /** Session-conf surface for the tree-reduce fan-in, mirroring the
    * reference's `histogram.yaml:10` `split_every: 8` read through
    * `config.py` — callers that don't pass `splitEvery` explicitly get
    * the conf value, falling back to the reference's default of 8. */
  final val SplitEveryConf = "spark.graft.histogram.splitEvery"
  final val SplitEveryDefault = 8

  def resolveSplitEvery(spark: SparkSession): Int = {
    val v = spark.conf.get(SplitEveryConf, SplitEveryDefault.toString).toInt
    require(v >= 2, s"$SplitEveryConf must be >= 2, got $v")
    v
  }

  /** Reduction-tree depth for P partitions at the given fan-in. */
  def treeDepth(partitions: Int, splitEvery: Int): Int = math.max(1,
    math.ceil(math.log(partitions.toDouble) / math.log(splitEvery.toDouble)).toInt)

  /** Explicit multi-level tree reduction — the reference's `split_every`
    * control (`core.py:856-885`, default fan-in 8 from `histogram.yaml:10`).
    * Spark's partial/final hash agg is 2 levels and suffices for bin-count-
    * sized states; this RDD `treeAggregate` path is the knob for the
    * extreme regime (huge bin count × very many partitions) where even the
    * final agg's fan-in should be bounded: depth = ceil(log_splitEvery(P)).
    * `splitEvery = None` reads [[SplitEveryConf]] (reference: yaml config).
    * Returns the dense flow-inclusive array driver-side. */
  def fillTree(spec: HistSpec, df: DataFrame, cols: Seq[Column],
      weight: Option[Column] = None, splitEvery: Option[Int] = None): Array[Double] = {
    val fanIn = splitEvery.getOrElse(resolveSplitEvery(df.sparkSession))
    require(axesNumeric(spec), "fillTree requires numeric axes")
    val totalL = spec.denseBinCount(flow = true)
    require(totalL > 0 && totalL <= (1L << 28),
      s"fillTree dense buffer out of range: $totalL bins")
    val total = totalL.toInt
    val idx = flatIndexCol(spec, cols)
    val w = weight.getOrElse(lit(1.0)).cast(DoubleType)
    val rows = df.select(idx.as("__i"), w.as("__w"))
      // circular axes emit NULL keys for non-finite values; NULL weights
      // are no-contribution rows — both would NPE Row.getLong/getDouble
      .filter(col("__i").isNotNull && col("__w").isNotNull)
      .rdd.map(r => (r.getLong(0), r.getDouble(1)))
    val p = math.max(rows.getNumPartitions, 1)
    val depth = treeDepth(p, fanIn)
    rows.treeAggregate(new Array[Double](total))(
      seqOp = (buf, iw) => {
        if (iw._1 >= 0 && iw._1 < total) buf(iw._1.toInt) += iw._2; buf
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = depth)
  }

  /** Flat (row-major) bin index over all axes incl. flow:
    * idx = Σ_d i_d * stride_d with stride = Π of later dims' (n+2).
    * Strides computed in Long — Int products overflow beyond ~1300 bins
    * per axis in 3-D. */
  def flatIndexCol(spec: HistSpec, cols: Seq[Column]): Column = {
    require(axesNumeric(spec), "flat index requires numeric axes")
    require(cols.size == spec.ndim,
      s"flat index needs ${spec.ndim} coordinate columns, got ${cols.size}")
    val dims = spec.axes.map(a => (a.nBins + 2).toLong)
    val strides = dims.scanRight(1L)(_ * _).tail // stride_d = prod dims after d
    spec.axes.zip(cols).zip(strides).map { case ((ax, c), s) =>
      ax.binCol(c) * lit(s)
    }.reduce(_ + _)
  }

  /** Dense fast path, any ndim: the whole histogram as ONE Array[Double]
    * aggregation buffer ([[graft.functions.DenseHistAgg]]) — per-partition
    * dense fill + BOUNDED-fan-in buffer merge, the literal analog of the
    * reference's per-partition `bh.Histogram` + `split_every` tree reduce
    * (`core.py:856-885`, `histogram.yaml:10`). Returns the same sparse
    * relational shape as [[fill]] (flow rows included, zero bins kept) by
    * exploding the merged array and decomposing the flat index.
    *
    * Why the tree matters HERE specifically: a bare `.agg()` funnels every
    * input partition's dense buffer into ONE final reducer — at 800k scan
    * tasks × an n-bin buffer that single task is the reduction bottleneck
    * the reference's `split_every` exists to prevent. So when the input has
    * more partitions than the fan-in, partials are first grouped by
    * `pmod(spark_partition_id, ceil(P / fanIn))` (each group merges ≤ fanIn
    * buffers; only buffers cross the shuffle, never rows — the grouping key
    * is constant within a partition so map-side combine leaves exactly one
    * buffer per input partition), then [[graft.functions.DenseMergeAgg]]
    * levels repeat the contraction until one buffer remains:
    * depth = ceil(log_fanIn(P)), each task merging ≤ fanIn arrays.
    * `splitEvery = None` reads [[SplitEveryConf]] (reference yaml config). */
  def fillDense(spec: HistSpec, df: DataFrame, cols: Seq[Column],
      weight: Option[Column] = None, splitEvery: Option[Int] = None): DataFrame = {
    require(axesNumeric(spec), "fillDense requires numeric (indexed) axes")
    val totalL = spec.denseBinCount(flow = true)
    require(totalL > 0 && totalL <= (1L << 26),
      s"fillDense dense buffer out of range: $totalL bins")
    val total = totalL.toInt
    val fanIn = splitEvery.getOrElse(resolveSplitEvery(df.sparkSession))
    // the conf path validates in resolveSplitEvery; the explicit path must
    // too — fanIn < 2 makes the merge loop non-contracting (fanIn = 1
    // never terminates, <= 0 leaves unmerged partial buffers)
    require(fanIn >= 2, s"splitEvery must be >= 2, got $fanIn")
    val idx = flatIndexCol(spec, cols)
    val w = weight.getOrElse(lit(1.0)).cast(DoubleType)
    val rows = df.select(idx.as("__i"), w.as("__w"))
    // plan-only partition probe (split enumeration for parquet scans) —
    // sizes the reduction tree to the real partial count
    val p = math.max(rows.rdd.getNumPartitions, 1)
    val merged =
      if (p <= fanIn) {
        // few enough partials that the final reducer's fan-in is already
        // bounded — single-level aggregation
        rows.agg(graft.functions.DenseHistAgg(col("__i"), col("__w"), total).as("__h"))
      } else {
        var groups = math.ceil(p.toDouble / fanIn).toInt
        var h = rows
          .select(pmod(spark_partition_id().cast("long"), lit(groups.toLong)).as("__g"),
            col("__i"), col("__w"))
          .groupBy(col("__g"))
          .agg(graft.functions.DenseHistAgg(col("__i"), col("__w"), total).as("__h"))
        while (groups > 1) {
          val next = math.ceil(groups.toDouble / fanIn).toInt
          h =
            if (next <= 1)
              h.agg(graft.functions.DenseMergeAgg(col("__h"), total).as("__h"))
            else h.select(pmod(col("__g"), lit(next.toLong)).as("__g"), col("__h"))
              .groupBy(col("__g"))
              .agg(graft.functions.DenseMergeAgg(col("__h"), total).as("__h"))
          groups = next
        }
        h.select(col("__h"))
      }
    // flat index → per-axis indices (row-major strides, matching
    // flatIndexCol); `div` keeps everything integral
    val dims = spec.axes.map(a => (a.nBins + 2).toLong)
    val strides = dims.scanRight(1L)(_ * _).tail
    val idxCols = strides.zip(dims).zipWithIndex.map { case ((s, n), d) =>
      expr(s"CAST(__pos AS BIGINT) div ${s}L % ${n}L").as(s"i$d")
    }
    merged.select(posexplode(col("__h")).as(Seq("__pos", "value")))
      .select(idxCols :+ col("value"): _*)
  }

  /** Density normalization: value / (Σvalue * binWidth). The reference
    * *accepts* density= but never applies it (`routines.py:417-421` — see
    * SURVEY.md §2.5 A14); we implement it correctly and document the
    * divergence. 1-D numeric axes. */
  def density(spec: HistSpec, h: DataFrame): DataFrame = {
    require(spec.ndim == 1 && !spec.axes.head.isCategorical,
      "density currently supports 1-D numeric axes")
    val ax = spec.axes.head
    val widths = ax.edges.sliding(2).map(p => p(1) - p(0)).toArray
    val widthCol = {
      // in-range bins i in [1, n]; flow bins get NULL width → NULL density
      val pairs = widths.zipWithIndex.map { case (w, i) => (i + 1L, w) }
      pairs.foldRight(lit(null).cast(DoubleType): Column) { case ((i, w), rest) =>
        when(col("i0") === i, lit(w)).otherwise(rest)
      }
    }
    // scalar total via broadcast cross-join, not an empty-frame window —
    // the input is only O(bins) rows, but WindowExec would still force a
    // single-partition exchange (and a noisy warning) for no benefit
    val tot = h.agg(sum(when(col("i0") >= 1 && col("i0") <= ax.nBins,
      col("value")).otherwise(lit(0.0))).as("__total"))
    h.crossJoin(broadcast(tot))
      .withColumn("density", col("value") / (col("__total") * widthCol))
      .drop("__total")
  }
}
