package graft.hist

/** Bins/range argument normalization — the reference's `bins.py`
  * (`/root/reference/src/dask_histogram/bins.py:14-205`): classify the
  * (bins, range) calling styles of the numpy-compat API and broadcast them
  * to one `(bins, range)` pair per dimension, with the reference's
  * validation rules.
  *
  * Styles (ref `bins.py:14-31`):
  *  - scalar bin count            → needs a range per dimension
  *  - per-dim bin counts          → needs per-dim ranges
  *  - single edges sequence       → range must be absent
  *  - per-dim edges sequences     → range must be absent
  */
object BinsSpec {

  sealed trait Bins
  final case class Count(n: Int) extends Bins
  final case class CountPerDim(ns: Seq[Int]) extends Bins
  final case class Edges(es: Seq[Double]) extends Bins
  final case class EdgesPerDim(ess: Seq[Seq[Double]]) extends Bins

  final case class RangePair(lo: Double, hi: Double)

  /** One normalized per-dimension spec: either explicit edges or
    * (count, range). */
  sealed trait DimBins
  final case class DimCount(n: Int, range: RangePair) extends DimBins
  final case class DimEdges(es: Seq[Double]) extends DimBins

  // reference error strings, verbatim (`bins.py:63-65,130-132,142-144,
  // 149-151,200,203`) — message-level parity with the Python API
  private val ErrBinsDim =
    "Total number of bins definitions must be equal to the dimensionality of the histogram."
  private val ErrRangeNone =
    "range cannot be None when bins argument is a scalar or sequence of scalars."
  private val ErrRangeDim =
    "Total number of range pairs must be equal to the dimensionality of the histogram."
  private val ErrIncompatRange = "incompatible range argument"
  private val ErrSameLen = "bins and range arguments must be the same length"

  /** Normalize to one DimBins per dimension (ref
    * `normalize_bins_range`, `bins.py:160-205`; error messages match the
    * reference's verbatim). */
  def normalize(ndim: Int, bins: Bins, range: Option[Seq[Option[RangePair]]]): Seq[DimBins] =
    {
      // explicit throws, not require(): require prefixes "requirement
      // failed: " and would break the verbatim message match
      def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
      bins match {
        case Count(n) =>
          val rs = range.getOrElse(fail(ErrRangeNone))
          if (rs.size != ndim) fail(ErrSameLen)
          rs.map(r => DimCount(n, r.getOrElse(fail(ErrRangeNone))))
        case CountPerDim(ns) =>
          if (ns.size != ndim) fail(ErrBinsDim)
          val rs = range.getOrElse(fail(ErrRangeNone))
          if (rs.size != ndim) fail(ErrRangeDim)
          ns.zip(rs).map { case (n, r) => DimCount(n, r.getOrElse(fail(ErrRangeNone))) }
        case Edges(es) =>
          if (!range.forall(_.forall(_.isEmpty))) fail(ErrIncompatRange)
          Seq.fill(ndim)(DimEdges(es))
        case EdgesPerDim(ess) =>
          if (ess.size != ndim) fail(ErrBinsDim)
          if (!range.forall(_.forall(_.isEmpty))) fail(ErrIncompatRange)
          ess.map(DimEdges)
      }
    }

  /** Build axes from normalized per-dim bins (ref `routines.py:444-450`:
    * Variable if edges, else Regular). */
  def toAxes(dims: Seq[DimBins]): Seq[Axis] = dims.map {
    case DimCount(n, RangePair(lo, hi)) => Regular(n, lo, hi)
    case DimEdges(es)                   => Variable(es)
  }
}
