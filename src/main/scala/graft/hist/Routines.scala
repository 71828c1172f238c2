package graft.hist

import org.apache.spark.sql.{Column, DataFrame}

/** NumPy-compat entry points (reference `routines.py`:
  * `histogram` `:29-128`, `histogram2d` `:131-253`, `histogramdd`
  * `:256-463`). As in the reference, 1-D and 2-D delegate to the N-D
  * implementation (`routines.py:114-125`, `:239-250`).
  *
  * Returns the sparse relational histogram H = (i0..iD, value…). Use
  * [[Hist.densify]] for the dense (n+2)^D array form and
  * [[HistSpec]].axes(i).edges for the edge arrays.
  */
object Routines {

  def histogram(df: DataFrame, x: Column, bins: BinsSpec.Bins,
      range: Option[BinsSpec.RangePair] = None, weights: Option[Column] = None,
      storage: Storage = DoubleStorage, sample: Option[Column] = None,
      density: Boolean = false, upperInclusive: Boolean = false): (HistSpec, DataFrame) =
    histogramdd(df, Seq(x), bins, range.map(r => Seq(Some(r))), weights, storage,
      sample, density, upperInclusive)

  def histogram2d(df: DataFrame, x: Column, y: Column, bins: BinsSpec.Bins,
      range: Option[Seq[Option[BinsSpec.RangePair]]] = None,
      weights: Option[Column] = None, storage: Storage = DoubleStorage,
      sample: Option[Column] = None, upperInclusive: Boolean = false): (HistSpec, DataFrame) =
    histogramdd(df, Seq(x, y), bins, range, weights, storage, sample,
      upperInclusive = upperInclusive)

  /** (N, D)-array input style (reference input-shape dispatch,
    * `routines.py:428-440`: a single 2-D array is treated as N samples of
    * D coordinates): one ArrayType column supplies all D coordinates. */
  def histogramddFromArray(df: DataFrame, arr: Column, d: Int,
      bins: BinsSpec.Bins, range: Option[Seq[Option[BinsSpec.RangePair]]] = None,
      weights: Option[Column] = None, storage: Storage = DoubleStorage,
      sample: Option[Column] = None): (HistSpec, DataFrame) = {
    require(d >= 1, "need at least one dimension")
    val cols = (1 to d).map(i => org.apache.spark.sql.functions.element_at(arr, i))
    histogramdd(df, cols, bins, range, weights, storage, sample)
  }

  /** N-D master entry. `density=true` applies correct normalization (the
    * reference validates but silently ignores `density` —
    * `routines.py:417-421`; divergence documented in SURVEY.md §2.5 A14).
    *
    * `upperInclusive=true` gives the last bin NumPy's closed upper edge
    * (x == hi counts in bin n, not overflow). The reference keeps boost's
    * right-exclusive counts even in its numpy-style returns and documents
    * the divergence (`boost.py:413-416`) — a post-hoc conversion is
    * impossible once x == hi fills have landed in overflow, so the
    * convention is chosen here, at fill time. Default follows the
    * reference (boost semantics). */
  def histogramdd(df: DataFrame, cols: Seq[Column], bins: BinsSpec.Bins,
      range: Option[Seq[Option[BinsSpec.RangePair]]] = None,
      weights: Option[Column] = None, storage: Storage = DoubleStorage,
      sample: Option[Column] = None, density: Boolean = false,
      upperInclusive: Boolean = false): (HistSpec, DataFrame) = {
    val axes0 = BinsSpec.toAxes(BinsSpec.normalize(cols.size, bins, range))
    val axes = if (!upperInclusive) axes0 else axes0.map {
      case r: Regular => r.copy(upperInclusive = true)
      case v: Variable => v.copy(upperInclusive = true)
      case a => a
    }
    val spec = HistSpec(axes, storage)
    val h = Hist.fill(spec, df, cols, weights, sample)
    val out = if (density) Hist.density(spec, h) else h
    (spec, out)
  }
}
