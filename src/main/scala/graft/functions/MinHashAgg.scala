package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE aggregate with an Array[Long] buffer.
  *
  * The `functions._` encoding — 64 separate `min((h*a_i+b_i) % p)`
  * aggregates — generates a HashAggregate whose Janino compilation
  * dominates cold-query time (~16 s measured). One typed buffer holding
  * all `numHashes` minima compiles in milliseconds and updates in a tight
  * loop; merge is elementwise min (associative, partitioning-independent).
  *
  * Input: `h` = 31-bit base hash of the shingle (pmod(xxhash64, p));
  * coefficients stay < 2^31 so h*a+b < 2^62 never overflows.
  */
case class MinHashAgg(child: Expression, as: Array[Long], bs: Array[Long], p: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(as.length == bs.length && as.nonEmpty)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(as.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = child.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var i = 0
      while (i < as.length) {
        val v = (h * as(i) + bs(i)) % p
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c(0))
}

object MinHashAgg {
  def apply(h: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    GraftShims.toColumn(
      MinHashAgg(GraftShims.toExpression(h), as, bs, p).toAggregateExpression())
}
