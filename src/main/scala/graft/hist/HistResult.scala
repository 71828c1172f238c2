package graft.hist

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side materialization of a sparse histogram — the reference's
  * result-object surface (`values`/`variances`/`counts` accessors,
  * `core.py:695-705`; `to_numpy`-style dense arrays + edge arrays,
  * `core.py:1098-1154`). Collect happens once; the dense scatter is a
  * driver-side O(bins) loop over the collected sparse rows.
  */
final case class HistResult(spec: HistSpec, rows: Array[(Array[Long], Array[Double])]) {

  private def dims(flow: Boolean): Array[Int] =
    spec.axes.map(_.nBins + (if (flow) 2 else 0)).toArray

  private def stateIdx(name: String): Int = {
    val i = spec.storage.stateCols.indexOf(name)
    require(i >= 0, s"storage ${spec.storage} has no state column '$name'")
    i
  }

  /** Dense row-major array of one state column, shape (n[+2])^D. */
  def dense(stateCol: String, flow: Boolean = true): Array[Double] = {
    val d = dims(flow)
    val strides = d.scanRight(1)(_ * _).tail
    val out = new Array[Double](d.product)
    val si = stateIdx(stateCol)
    rows.foreach { case (idx, st) =>
      // sparse indices always carry flow offsets (0..n+1); shift when trimmed
      var flat = 0L
      var ok = true
      idx.indices.foreach { k =>
        val i = if (flow) idx(k) else idx(k) - 1
        if (i < 0 || i >= d(k)) ok = false else flat += i * strides(k)
      }
      if (ok) out(flat.toInt) = st(si)
    }
    out
  }

  /** counts(flow=) — first state column (value / n). */
  def counts(flow: Boolean = true): Array[Double] =
    dense(spec.storage.stateCols.head, flow)
  def values(flow: Boolean = true): Array[Double] = counts(flow)
  def variances(flow: Boolean = true): Option[Array[Double]] =
    if (spec.storage.stateCols.contains("variance")) Some(dense("variance", flow))
    else None

  /** Per-axis edge arrays; flow pads ±inf (ref `core.py:1147-1148`). */
  def edges(flow: Boolean = false): Seq[Array[Double]] = spec.axes.map { ax =>
    if (flow) Array(Double.NegativeInfinity) ++ ax.edges ++ Array(Double.PositiveInfinity)
    else ax.edges
  }

  /** Axis names as constructed — the reference's `h.axes.name` tuple,
    * which survives fill → compute (`tests/test_boost.py:536-556`). */
  def axisNames: Seq[String] = spec.axisNames

  /** Edge array of the axis named `name`. */
  def edgesOf(name: String, flow: Boolean = false): Array[Double] =
    edges(flow)(spec.axisIndex(name))

  /** Dense row-major LONG array of one state column — the integer-dtype
    * return the reference surfaces for Int64/AtomicInt64 storages
    * (`core.py:1138-1142` picks the dense dtype from the storage; our
    * collect path carries doubles, exact for counts < 2^53, so the
    * round-trip through double is lossless for any collectable count). */
  def denseLong(stateCol: String, flow: Boolean = true): Array[Long] = {
    require(spec.storage == Int64Storage || spec.storage == AtomicInt64Storage,
      s"denseLong is the integer-storage surface; ${spec.storage} is float-valued")
    dense(stateCol, flow).map(_.toLong)
  }
}

object HistResult {
  /** Collect a sparse numeric-axis histogram into a driver result. */
  def collect(spec: HistSpec, h: DataFrame): HistResult = {
    require(spec.axes.forall(!_.isCategorical),
      "HistResult.collect requires numeric (indexed) axes")
    val n = spec.ndim
    val states = spec.storage.stateCols
    val rows = h.select((spec.indexCols.map(col) ++ states.map(c => col(c).cast("double"))): _*)
      .collect()
      .map { r =>
        (Array.tabulate(n)(i => r.getLong(i)),
          Array.tabulate(states.size)(j => r.getDouble(n + j)))
      }
    HistResult(spec, rows)
  }
}
