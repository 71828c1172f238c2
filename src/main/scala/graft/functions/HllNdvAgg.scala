package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** COUNT(DISTINCT)-shaped HLL estimate: the same m-byte register buffer
  * as [[HllAgg]] (same portable-hash input contract, same merge law) but
  * `eval` returns `floor(round₄(estimate))` as LONG — the drop-in
  * aggregate the [[graft.plans.ApproxNdvRewrite]] optimizer rule
  * substitutes for an exact distinct count. The estimator is the ONE
  * scalar implementation ([[HllNdvAgg.estimateFromRegisters]]) whose
  * identity with the relational column form
  * ([[graft.ops.SketchOps.hllEstimate]]) is spec-pinned, so a rewritten
  * query stays oracle-checkable via the registers-recompute discipline.
  */
case class HllNdvAgg(child: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 16, "HLL needs at least 16 registers")

  private val wBits: Int = HllAgg.rankBits(m)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

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
    math.floor(HllNdvAgg.estimateFromRegisters(buf, m)).toLong

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllNdvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllNdvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllNdvAgg =
    copy(child = c(0))
}

object HllNdvAgg {
  def apply(h: Column, m: Int): Column =
    GraftShims.toColumn(
      HllNdvAgg(GraftShims.toExpression(h), m).toAggregateExpression())

  /** Scalar twin of [[graft.ops.SketchOps.hllEstimate]] — identical
    * scaled-integer register sum, identical linear-counting branch,
    * identical HALF_UP round at 4dp (spec-pinned against the column
    * form, so the aggregate and the relational oracle cannot drift). */
  def estimateFromRegisters(regs: Array[Byte], m: Int): Double = {
    val rmax = HllAgg.rankBits(m) + 1
    var sScaled = 0L
    var v = 0
    var i = 0
    while (i < m) {
      sScaled += 1L << (rmax - regs(i))
      if (regs(i) == 0) v += 1
      i += 1
    }
    val raw = graft.ops.SketchOps.hllAlphaM2(m) * 2.0 *
      graft.ops.SketchOps.hllDomainSize(m) / sScaled.toDouble
    val est =
      if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
