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

  /** Normalize to one DimBins per dimension (ref
    * `normalize_bins_range`, `bins.py:160-205`). */
  def normalize(ndim: Int, bins: Bins, range: Option[Seq[Option[RangePair]]]): Seq[DimBins] =
    bins match {
      case Count(n) =>
        val rs = range.getOrElse(
          throw new IllegalArgumentException("Integer bins requires range definitions"))
        require(rs.size == ndim,
          s"range ($rs) is not compatible with $ndim dimensions")
        rs.map(r => DimCount(n, r.getOrElse(
          throw new IllegalArgumentException("Integer bins requires range definitions"))))
      case CountPerDim(ns) =>
        require(ns.size == ndim, s"bins ($ns) is not compatible with $ndim dimensions")
        val rs = range.getOrElse(
          throw new IllegalArgumentException("Integer bins requires range definitions"))
        require(rs.size == ndim, s"range ($rs) is not compatible with $ndim dimensions")
        ns.zip(rs).map { case (n, r) => DimCount(n, r.getOrElse(
          throw new IllegalArgumentException("Integer bins requires range definitions"))) }
      case Edges(es) =>
        require(range.forall(_.forall(_.isEmpty)),
          "Bins defined by edges; range must not be given")
        Seq.fill(ndim)(DimEdges(es))
      case EdgesPerDim(ess) =>
        require(ess.size == ndim, s"bins ($ess) is not compatible with $ndim dimensions")
        require(range.forall(_.forall(_.isEmpty)),
          "Bins defined by edges; range must not be given")
        ess.map(DimEdges)
    }

  /** Build axes from normalized per-dim bins (ref `routines.py:444-450`:
    * Variable if edges, else Regular). */
  def toAxes(dims: Seq[DimBins]): Seq[Axis] = dims.map {
    case DimCount(n, RangePair(lo, hi)) => Regular(n, lo, hi)
    case DimEdges(es)                   => Variable(es)
  }
}
