package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch by BOTTOM-K UNIFORM SAMPLING (Cohen &
  * Kaplan's bottom-k sketch pointed at order statistics): keep the k
  * (hash, value) pairs with the smallest portable hash over a row-unique
  * key; the kept values are a uniform random sample of the value column,
  * so any quantile is the matching order statistic of the sample —
  * WITHOUT a pre-declared histogram axis (the gap
  * `HistAlgebra.quantiles` and `approx_percentile` leave open).
  *
  * Why not literal KLL/t-digest: both are mergeable but not
  * merge-ORDER-independent (KLL compaction consumes random bits; t-digest
  * centroids depend on insertion order), so their state cannot be
  * recomputed relationally and the portable-determinism discipline that
  * makes [[HllAgg]]/[[KmvAgg]] oracle-checkable would be lost. The
  * bottom-k state is a pure function of the input SET — `SELECT DISTINCT
  * pairs ORDER BY h, v LIMIT k` IS the sketch, on any engine. The price
  * is sample-statistics error O(1/√k) instead of KLL's O(1/k); at the
  * default k = 256 that is ±~6% rank error, the right trade for
  * monitoring-grade percentiles with certified cross-engine agreement.
  *
  * Merge is "union, keep k smallest pairs" — associative, commutative,
  * and (because the buffer is a SET of pairs) idempotent, so re-delivery
  * and any partitioning/merge tree yield the identical sketch
  * (ScalaCheck-pinned in QuantileSketchSpec). Hash ties between DISTINCT
  * rows collapse to one pair per distinct (h, v) — a ~n/P effect shared
  * verbatim by the SQL twin.
  *
  * `hashChild` must be a mixed portable hash in [0, P) over a ROW-UNIQUE
  * key ([[graft.ops.SketchOps.quantileSketchHash]]); `valueChild` must be
  * a finite non-null double (callers filter nulls/NaN — ordering of NaN
  * differs across engines).
  *
  * Returns the sampled values as array<double> sorted ascending — the
  * quantile readout `s[max(1, ceil(q·|s|))]` is left to visible column
  * arithmetic ([[graft.ops.SketchOps.sketchQuantile]]) so the formula
  * sits in the plan and is mirrored verbatim in the oracle, the
  * [[HllAgg]]/`hllEstimate` split. With `withHashes = true` it instead
  * returns the full (h, v) pair array sorted by (h, v) — the
  * PERSISTENCE form: the pairs ARE the sketch state, so samples stored
  * per snapshot merge later by the same k-smallest-union law
  * ([[graft.ops.SketchOps.quantileSketchUnionCol]]), the CMS/KMV
  * incremental-corpus pattern.
  */
case class QuantileSketchAgg(hashChild: Expression, valueChild: Expression,
    k: Int, withHashes: Boolean = false, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[(Long, Double)]] {

  require(k >= 8, s"quantile sketch needs k >= 8, got $k")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (withHashes) ArrayType(QuantileSketchAgg.pairType, containsNull = false)
    else ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Double)] =
    mutable.TreeSet.empty[(Long, Double)]

  private def insert(buf: mutable.TreeSet[(Long, Double)],
      pair: (Long, Double)): Unit = {
    if (buf.size < k) { buf += pair }
    else if (Ordering[(Long, Double)].lt(pair, buf.last)) {
      buf += pair
      if (buf.size > k) buf -= buf.last
    }
  }

  override def update(buf: mutable.TreeSet[(Long, Double)],
      input: InternalRow): mutable.TreeSet[(Long, Double)] = {
    val hv = hashChild.eval(input)
    val vv = valueChild.eval(input)
    if (hv != null && vv != null)
      insert(buf, (hv.asInstanceOf[Long], vv.asInstanceOf[Double]))
    buf
  }

  override def merge(a: mutable.TreeSet[(Long, Double)],
      b: mutable.TreeSet[(Long, Double)]): mutable.TreeSet[(Long, Double)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[(Long, Double)]): Any =
    if (withHashes)
      new GenericArrayData(buf.toArray.map { case (h, v) =>
        InternalRow(h, v)
      })
    else new GenericArrayData(buf.toArray.map(_._2).sorted)

  override def serialize(buf: mutable.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.TreeSet[(Long, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = mutable.TreeSet.empty[(Long, Double)]
    while (bb.remaining() >= 16) out += ((bb.getLong, bb.getDouble))
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : QuantileSketchAgg =
    copy(hashChild = c(0), valueChild = c(1))
}

object QuantileSketchAgg {
  /** Field order (h, v) makes array_sort's lexicographic struct ordering
    * THE pair ordering — the union law needs no comparator. */
  val pairType: StructType = StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  def apply(h: Column, v: Column, k: Int): Column =
    GraftShims.toColumn(
      QuantileSketchAgg(GraftShims.toExpression(h), GraftShims.toExpression(v),
        k).toAggregateExpression())

  def pairs(h: Column, v: Column, k: Int): Column =
    GraftShims.toColumn(
      QuantileSketchAgg(GraftShims.toExpression(h), GraftShims.toExpression(v),
        k, withHashes = true).toAggregateExpression())
}
