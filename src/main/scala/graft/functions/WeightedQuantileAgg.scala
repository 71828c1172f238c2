package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Percentile estimate by bottom-k DISTINCT-VALUE sampling with exact
  * multiplicities (Gibbons' distinct sampling pointed at quantiles): keep
  * the k distinct values whose portable hash is smallest, counting EVERY
  * occurrence of a kept value, and read the q-quantile as the smallest
  * kept value whose cumulative count reaches q of the kept total — a
  * Horvitz–Thompson ratio estimate of the value CDF.
  *
  * This is the aggregate [[graft.plans.ApproxQuantileRewrite]]
  * substitutes for Spark's exact `Percentile`, whose buffer holds the
  * ENTIRE per-group value multiset in executor memory (the OOM cliff a
  * 100 TB percentile hits); this buffer is ≤ k (hash, value, count)
  * triples. Unlike [[QuantileSketchAgg]] (which samples ROWS and needs a
  * row-unique key) this samples the value DOMAIN — the only option
  * inside an optimizer rule, where no key column exists — so accuracy
  * degrades when a few values carry most of the mass ... and improves to
  * EXACT when there are ≤ k distinct values (every value kept, counts
  * complete), the common case for grid-valued metric columns.
  *
  * Count exactness for survivors: a pair in the final k-smallest is
  * accepted at every intermediate point (the buffer's k-th smallest hash
  * over a subset can only be ≥ the overall k-th smallest), so eviction
  * only ever discards counts of values that do NOT survive — the final
  * counts are exact, and merge (count-sum on matching pairs, then
  * truncate) is associative and commutative by the same argument. State
  * is a pure function of the input multiset, so a DuckDB oracle
  * recomputes it relationally (`GROUP BY value → count, hash, ORDER BY
  * hash LIMIT k`) — the [[HllNdvAgg]] certificate discipline.
  *
  * The readout is integer arithmetic end to end (cum·1e6 ≥ qPpm·total on
  * BIGINT counts) and returns a SAMPLED INPUT VALUE (percentile_disc
  * flavor, not Percentile's interpolation — documented divergence of the
  * opt-in approximation mode). Empty input → null, matching Percentile.
  *
  * `hashChild` must be the mixed portable hash of the value's string
  * form ([[graft.ops.SketchOps.quantileSketchHash]] over CAST(v AS
  * STRING)); `qPpm` the quantile in parts-per-million (500000 = median).
  */
case class WeightedQuantileAgg(hashChild: Expression, valueChild: Expression,
    qPpm: Long, k: Int, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeMap[(Long, Double), Long]] {

  require(k >= 16, s"distinct-value sample needs k >= 16, got $k")
  require(qPpm > 0L && qPpm <= 1000000L,
    s"qPpm must be in (0, 1000000], got $qPpm")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer()
      : mutable.TreeMap[(Long, Double), Long] =
    mutable.TreeMap.empty[(Long, Double), Long]

  private def add(buf: mutable.TreeMap[(Long, Double), Long],
      pair: (Long, Double), c: Long): Unit = {
    buf.get(pair) match {
      case Some(c0) => buf(pair) = c0 + c
      case None =>
        if (buf.size < k) buf(pair) = c
        else if (Ordering[(Long, Double)].lt(pair, buf.lastKey)) {
          buf -= buf.lastKey
          buf(pair) = c
        }
    }
  }

  override def update(buf: mutable.TreeMap[(Long, Double), Long],
      input: InternalRow): mutable.TreeMap[(Long, Double), Long] = {
    val hv = hashChild.eval(input)
    val vv = valueChild.eval(input)
    if (hv != null && vv != null)
      add(buf, (hv.asInstanceOf[Long], vv.asInstanceOf[Double]), 1L)
    buf
  }

  override def merge(a: mutable.TreeMap[(Long, Double), Long],
      b: mutable.TreeMap[(Long, Double), Long])
      : mutable.TreeMap[(Long, Double), Long] = {
    b.foreach { case (pair, c) => add(a, pair, c) }
    a
  }

  override def eval(buf: mutable.TreeMap[(Long, Double), Long]): Any =
    WeightedQuantileAgg.estimate(buf.toSeq.map { case ((_, v), c) => (v, c) },
      qPpm) match {
      case Some(v) => v
      case None => null
    }

  override def serialize(buf: mutable.TreeMap[(Long, Double), Long])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 24)
    buf.foreach { case ((h, v), c) =>
      bb.putLong(h); bb.putDouble(v); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.TreeMap[(Long, Double), Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = mutable.TreeMap.empty[(Long, Double), Long]
    while (bb.remaining() >= 24)
      out((bb.getLong, bb.getDouble)) = bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): WeightedQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : WeightedQuantileAgg =
    copy(hashChild = c(0), valueChild = c(1))
}

object WeightedQuantileAgg {
  def apply(h: Column, v: Column, qPpm: Long, k: Int): Column =
    GraftShims.toColumn(
      WeightedQuantileAgg(GraftShims.toExpression(h),
        GraftShims.toExpression(v), qPpm, k).toAggregateExpression())

  /** The ONE readout implementation (engine + specs share it): smallest
    * sampled value whose cumulative count reaches qPpm of the sample
    * total. The rank threshold ceil(qPpm*total/1e6) is computed once in
    * arbitrary precision, so the compare is exact for any Long total —
    * matching the DuckDB twin, whose `cum * 1000000 >= qPpm * total`
    * auto-widens to HUGEINT. */
  def estimate(sample: Seq[(Double, Long)], qPpm: Long): Option[Double] = {
    if (sample.isEmpty) return None
    val sorted = sample.sortBy(_._1)
    val total = sorted.map(_._2).sum
    // cum*1e6 >= qPpm*total  <=>  cum >= ceil(qPpm*total/1e6) for integer
    // cum; the threshold is <= total so it always fits back in a Long.
    val threshold =
      ((BigInt(qPpm) * BigInt(total) + 999999) / 1000000).toLong
    var cum = 0L
    sorted.foreach { case (v, c) =>
      cum += c
      if (cum >= threshold) return Some(v)
    }
    Some(sorted.last._1)
  }
}
