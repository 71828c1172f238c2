package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** 64-bit SimHash (Charikar 2002) as ONE aggregate: the buffer is the
  * 64 signed bit-counters; eval assembles the fingerprint (bit b set iff
  * counter b > 0). Replaces 64 separate sum-aggregates whose generated
  * code dominated cold-query time. Input: 64-bit token hash. */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val hv = child.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 4)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length / 4)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SimHashAgg =
    copy(child = c(0))
}

object SimHashAgg {
  def apply(h: Column): Column =
    GraftShims.toColumn(SimHashAgg(GraftShims.toExpression(h)).toAggregateExpression())
}
