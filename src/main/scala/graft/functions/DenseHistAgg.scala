package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Dense histogram fast path: the whole histogram as ONE fixed-size
  * Array[Double] aggregation buffer.
  *
  * This is the literal Spark re-expression of the reference's execution
  * model (per-partition `bh.Histogram` objects summed by a tree reduction,
  * `/root/reference/src/dask_histogram/core.py:63-140`, `:856-885`):
  * `update` adds a weight at a precomputed flat bin index, `merge` is a
  * vector add of two buffers, and Spark's partial/final ObjectHashAggregate
  * gives the bounded-fan-in combine. Only P buffers (≈ bins × 8 bytes)
  * cross the shuffle — never rows.
  *
  * Versus the sparse groupBy path: no per-row hash probe, no per-group
  * key allocation — wins when bin count is small relative to rows/partition
  * (the common histogram regime). The sparse path stays the default
  * because it handles growable category axes and huge/sparse bin spaces.
  *
  * Input: child = flat bin index (long, in [0, totalBins)), weight
  * (double). Output: array<double> of length totalBins.
  */
case class DenseHistAgg(idx: Expression, weight: Expression, totalBins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(totalBins > 0 && totalBins <= (1 << 26),
    s"totalBins out of range: $totalBins") // 64 MiB buffer cap

  override def children: Seq[Expression] = Seq(idx, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](totalBins)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val i = idx.eval(input)
    if (i != null) {
      val bin = i.asInstanceOf[Long]
      if (bin >= 0 && bin < totalBins) {
        val w = weight.eval(input)
        if (w != null) buf(bin.toInt) += w.asInstanceOf[Double]
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): DenseHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DenseHistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DenseHistAgg =
    copy(idx = c(0), weight = c(1))
}

object DenseHistAgg {
  /** Aggregate Column: dense histogram of `idx` (flat bin index) weighted
    * by `weight`, `totalBins` cells. */
  def apply(idx: Column, weight: Column, totalBins: Int): Column = {
    val agg = DenseHistAgg(GraftShims.toExpression(idx),
      GraftShims.toExpression(weight), totalBins)
    GraftShims.toColumn(agg.toAggregateExpression())
  }
}
