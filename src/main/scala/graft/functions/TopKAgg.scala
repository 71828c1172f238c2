package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact grouped top-k as a MERGEABLE bounded buffer — the aggregate
  * form of `row_number() OVER (PARTITION BY g ORDER BY score DESC, item
  * ASC) <= k`. The window form shuffles and per-group sorts EVERY input
  * row; this form partial-aggregates map-side, so at most k (score,
  * item) pairs per group leave each partition regardless of input size
  * — at a 10⁹-term domain with k=10, the exchange carries 10 rows per
  * group per partition instead of the whole relation. That shuffle
  * asymmetry is the entire point (plan + row-count asserted in
  * OpsSpec).
  *
  * Exactness: top-k under a TOTAL order is mergeable with no error —
  * merge = union + truncate, because any global top-k element is in the
  * top-k of every partition it appears in. The order is (score DESC,
  * item ASC); the item tiebreak makes the result set AND its layout
  * deterministic under any partitioning (the window twin states the
  * same ORDER BY, which is what lets a relational oracle hash-match).
  *
  * Buffer: a sorted array of ≤ k pairs; update is a binary-search
  * insert only when the candidate beats the current k-th (amortized
  * O(log k) for contending rows, O(1) reject otherwise); merge is a
  * bounded merge of two sorted arrays. Returns
  * array<struct<item string, score bigint>> in final rank order.
  */
case class TopKAgg(item: Expression, score: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(String, Long)]] {

  require(k >= 1, s"TopKAgg needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(item, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)

  // (score DESC, item ASC) as a comparison: negative = a ranks before b
  private def cmp(a: (String, Long), b: (String, Long)): Int = {
    val s = java.lang.Long.compare(b._2, a._2)
    if (s != 0) s else a._1.compareTo(b._1)
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(String, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(String, Long)],
      input: InternalRow): mutable.ArrayBuffer[(String, Long)] = {
    val iv = item.eval(input)
    val sv = score.eval(input)
    if (iv != null && sv != null) {
      val cand = (iv.asInstanceOf[UTF8String].toString,
        sv.asInstanceOf[Long])
      if (buf.size < k || cmp(cand, buf.last) < 0) {
        // binary search for the insertion point in rank order
        var lo = 0
        var hi = buf.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(buf(mid), cand) <= 0) lo = mid + 1 else hi = mid
        }
        buf.insert(lo, cand)
        if (buf.size > k) buf.remove(buf.size - 1)
      }
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(String, Long)],
      b: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] = {
    // bounded merge of two rank-sorted arrays
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    var i = 0
    var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && cmp(a(i), b(j)) <= 0)
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    out
  }

  override def eval(buf: mutable.ArrayBuffer[(String, Long)]): Any =
    new GenericArrayData(buf.map { case (it, sc) =>
      InternalRow(UTF8String.fromString(it), sc)
    }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(String, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, sc) => out.writeUTF(it); out.writeLong(sc) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(String, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(String, Long)]
    var i = 0
    while (i < n) { buf += ((in.readUTF(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg = copy(item = c(0), score = c(1))
}

object TopKAgg {
  def apply(item: Column, score: Column, k: Int): Column =
    GraftShims.toColumn(TopKAgg(GraftShims.toExpression(item),
      GraftShims.toExpression(score), k).toAggregateExpression())
}
