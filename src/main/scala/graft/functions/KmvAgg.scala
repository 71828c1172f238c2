package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002): keep
  * the k smallest DISTINCT hash values seen; if the kth-smallest is h_k
  * over a hash domain of size P, the distinct count estimate is
  * (k−1)·P/h_k (±1/√k relative error). Fewer than k distinct values ⇒
  * the sketch holds them all and the count is exact.
  *
  * Unlike HLL this is a deterministic function of the input SET given the
  * hash — with the engine-portable [[PolyHash]] the whole estimate is
  * DuckDB-oracle-checkable (`SELECT DISTINCT h ORDER BY h LIMIT k`).
  *
  * Scale shape: the buffer is k longs regardless of corpus size; merge is
  * a bounded set-union (associative, commutative, idempotent — safe under
  * any partitioning AND under re-delivery). The exact `countDistinct`
  * alternative shuffles the whole distinct domain through an Expand.
  *
  * Returns the sorted k-minima as array<bigint> — callers derive the
  * estimate with plain column arithmetic so the formula is visible in the
  * plan (and mirrored verbatim in the oracle).
  */
case class KmvAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, "KMV needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) { buf += h }
    else if (h < buf.last) { buf += h; if (buf.size > k) buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val hv = child.eval(input)
    if (hv != null) insert(buf, hv.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val arr = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(arr.length * 8)
    bb.asLongBuffer().put(arr)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val arr = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(arr)
    mutable.TreeSet.from(arr)
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(child = c(0))
}

object KmvAgg {
  def apply(h: Column, k: Int): Column =
    GraftShims.toColumn(
      KmvAgg(GraftShims.toExpression(h), k).toAggregateExpression())
}
