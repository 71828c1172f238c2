package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982) with the
  * MERGEABLE combine of Agarwal et al., "Mergeable Summaries" (PODS'12):
  * at most `k` counters; an arrival of a tracked item increments its
  * counter, an arrival of an untracked item either claims a free counter
  * or decrements ALL counters by one (dropping zeros). Merge = sum
  * counters pairwise, then subtract the (k+1)-th largest value from every
  * counter and keep the positive ones — Agarwal et al. prove the merged
  * summary keeps the one-pass bound.
  *
  * Deterministic guarantee (what callers may rely on): for every item,
  * `true_count − n/(k+1) ≤ est ≤ true_count` where `n` is the total
  * arrivals aggregated (locally AND across any merge tree, in any merge
  * order). Hence any item with `true_count > n/(k+1)` is present in the
  * output. The *estimates* and the *set of sub-threshold survivors* DO
  * depend on arrival partitioning and merge order — so this summary is a
  * CANDIDATE GENERATOR, not a final answer: follow with one exact
  * aggregation restricted to the candidate set (a broadcast-sized
  * relation) and threshold on the exact counts. That second pass is what
  * makes the end-to-end operator deterministic and oracle-checkable (see
  * [[graft.ops.TextOps.heavyHitterWords]]).
  *
  * Cost shape: update is amortized O(1) — each decrement-all step
  * destroys k+1 units of mass, so there are at most n/(k+1) such steps.
  * The buffer is ≤ k (string, long) pairs regardless of input size, and
  * the merge is O(k log k). The exact-groupBy alternative shuffles the
  * full distinct domain; this shuffles k rows per partition.
  *
  * Returns map<string, bigint> (item → conservative estimate; the
  * decremented counts, i.e. the LOWER bound side of the guarantee).
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "MisraGries needs k >= 1 counters")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of Spark's reused UTF8String buffer before storing
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // decrement-all (the arrival itself is the +1 that cancels one
          // of the k decrements): amortized against the mass destroyed
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (i, c) => if (c <= 0L) dead += i }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from all, keep positives
      val cut = a.values.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (i, c) => if (c <= 0L) dead += i }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic layout for a given buffer content
    val items = buf.toArray.sortBy { case (i, c) => (-c, i) }
    new ArrayBasedMapData(
      new GenericArrayData(items.map(p => UTF8String.fromString(p._1): Any)),
      new GenericArrayData(items.map(_._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) => out.writeUTF(i); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c(0))
}

object MisraGriesAgg {
  def apply(item: Column, k: Int): Column =
    GraftShims.toColumn(
      MisraGriesAgg(GraftShims.toExpression(item), k).toAggregateExpression())
}
