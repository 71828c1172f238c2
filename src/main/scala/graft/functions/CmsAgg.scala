package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch grid built as ONE aggregation buffer straight from
  * document text: each input row's tokens update a depth×width Long grid
  * in place; partials merge by vector add.
  *
  * The relational form (`explode(split(text)) → posexplode(depth cells) →
  * groupBy(r, bucket)`) materializes depth rows PER TOKEN before the
  * map-side combine; this aggregate materializes none — the only thing
  * that ever leaves a partition is the 32 KiB grid itself, the sketch's
  * entire point. Cell layout is IDENTICAL to
  * [[graft.ops.SketchOps.cmsSketch]] (same [[PolyHash]], same (a·h+b)
  * mod P mod width rows, same single-space tokens with empties kept), so
  * grids from either path merge and oracle-check interchangeably.
  * Output: array<long> of length depth·width, row-major (r·width+bucket).
  */
case class CmsAgg(text: Expression, depth: Int, width: Int,
    as: Seq[Long], bs: Seq[Long],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  // Long multiply: Int depth*width can overflow past the bound and wrap
  // into "valid" (e.g. 65536 x 65536 -> 0), allocating a too-small buffer
  require(depth > 0 && width > 0 && depth.toLong * width <= (1L << 24),
    s"grid out of range: $depth x $width")
  require(as.size == depth && bs.size == depth,
    "need one (a, b) coefficient pair per hash row")

  override def children: Seq[Expression] = Seq(text)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = text.eval(input)
    if (t != null) {
      val s = t.asInstanceOf[UTF8String].toString
      var start = 0
      var i = 0
      val n = s.length
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          val h = PolyHash.hash(s.substring(start, i), 31L)
          var r = 0
          while (r < depth) {
            // h, a, b all in [0, P): products stay < 2^62, plain % is pmod
            val bucket = (((h * aArr(r) + bArr(r)) % PolyHash.P) % width).toInt
            buf(r * width + bucket) += 1L
            r += 1
          }
          start = i + 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): CmsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(text = c(0))
}

object CmsAgg {
  /** Aggregate Column: CMS grid over whitespace tokens of `text`. */
  def apply(text: Column, depth: Int, width: Int,
      as: Seq[Long], bs: Seq[Long]): Column = {
    val agg = CmsAgg(GraftShims.toExpression(text), depth, width, as, bs)
    GraftShims.toColumn(agg.toAggregateExpression())
  }
}
