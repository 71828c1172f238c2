package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog-style distinct-count registers (Flajolet et al. 2007) over
  * an ENGINE-PORTABLE hash: the input column must already be a mixed
  * [[PolyHash]] value in [0, P) — register index is `h mod m`, and the
  * rank is the zero-run length of `h div m` measured against the hash
  * domain's bit width. Because both halves are plain integer arithmetic on
  * a portable hash, a DuckDB oracle recomputes the EXACT register contents
  * relationally (`GROUP BY h % m → max(rank)`) — unlike library HLLs whose
  * hash is engine-private.
  *
  * The buffer is m bytes regardless of input size; merge is elementwise
  * max — associative, commutative, idempotent, so it is safe under any
  * partitioning, map-side partial aggregation, AND re-delivery, and
  * sketches persisted from different snapshots combine by the same max.
  * (KMV — [[KmvAgg]] — gives exact-checkable ESTIMATES; HLL's registers
  * are 8× smaller per unit of accuracy and the estimate is derived, not
  * order-statistic, so both live in the toolbox.)
  *
  * The non-power-of-two hash domain (P = 1e9+7, so `h div m` is uniform on
  * [0, (P-1)/m] rather than a full bit range) biases P(rank ≥ r) by up to
  * ~7% at the top rank — well inside the sketch's nominal 1.04/√m error,
  * and identical on both engines since the oracle shares the domain.
  *
  * Returns the m register values as array<int> — the estimate is derived
  * by [[graft.ops.SketchOps.hllEstimate]] with visible column arithmetic
  * (exact dyadic sums: every 2^-rank term and their ≤ m-term sum are
  * exactly representable, so the estimate itself is cross-engine stable).
  */
case class HllAgg(child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 16, "HLL needs at least 16 registers")

  /** Bit width of the rank domain: h div m <= (P-1)/m. */
  private val wBits: Int = 64 - java.lang.Long.numberOfLeadingZeros((PolyHash.P - 1) / m)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val hv = child.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      val idx = (h % m).toInt
      val w = h / m
      val rank = if (w == 0) wBits + 1
        else wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllAgg =
    copy(child = c(0))
}

object HllAgg {
  def apply(h: Column, m: Int): Column =
    GraftShims.toColumn(
      HllAgg(GraftShims.toExpression(h), m).toAggregateExpression())

  /** Rank-domain bit width for a given register count — shared with the
    * SQL twin so the two sides cannot disagree on the rank formula. */
  def rankBits(m: Int): Int =
    64 - java.lang.Long.numberOfLeadingZeros((PolyHash.P - 1) / m).toInt
}
