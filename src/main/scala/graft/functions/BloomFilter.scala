package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bit arithmetic for the Bloom filter aggregate + membership test.
  *
  * Double hashing (Kirsch & Mitzenmacher 2006): position_j = h1 + j·h2 over
  * `numBits`, h2 forced odd so the probe sequence cycles the whole table.
  * All Long arithmetic happens in JVM code (operator internals), so ANSI
  * overflow checking never sees it.
  */
object BloomFilter {
  /** Filter sizing: bits per inserted key for the default build. 16
    * bits/key with 5 hashes gives ~5e-4 false-positive rate — FPs only
    * cost a redundant row in the exact-confirm join, never correctness. */
  final val DefaultNumHashes = 5

  def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  @inline private def mix(h: Long): Long = {
    // splitmix64 finalizer: decorrelates h2 from h1 for double hashing
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], numBits: Int, numHashes: Int, h: Long): Unit = {
    val h2 = mix(h) | 1L
    var j = 0
    var pos = h
    while (j < numHashes) {
      val bit = (((pos % numBits) + numBits) % numBits).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      pos += h2
      j += 1
    }
  }

  def mightContain(words: Array[Long], numBits: Int, numHashes: Int, h: Long): Boolean = {
    val h2 = mix(h) | 1L
    var j = 0
    var pos = h
    while (j < numHashes) {
      val bit = (((pos % numBits) + numBits) % numBits).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      pos += h2
      j += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }
}

/** Bloom filter build as ONE aggregate with an Array[Long] bitset buffer:
  * update sets `numHashes` bits per key, merge is wordwise OR (associative
  * and commutative — partitioning-independent), eval emits the bitset as
  * bytes. A 2^23-bit filter is 1 MiB — collected to the driver once and
  * rebroadcast into scans via [[BloomContains]], the runtime-filter
  * pattern for cross-snapshot joins (cf. Spark's own
  * BloomFilterAggregate/BloomFilterMightContain runtime filters, which are
  * not user-facing API).
  */
case class BloomFilterAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomFilter.numWords(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = child.eval(input)
    if (hv != null) BloomFilter.set(buf, numBits, numHashes, hv.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomFilter.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomFilter.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomFilter.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = c(0))
}

object BloomFilterAgg {
  def apply(h: Column, numBits: Int, numHashes: Int): Column =
    GraftShims.toColumn(
      BloomFilterAgg(GraftShims.toExpression(h), numBits, numHashes)
        .toAggregateExpression())
}

/** Membership probe against a built Bloom filter. The bitset lives in the
  * operator (closure-serialized once per task), not as a literal tree —
  * same rationale as [[HyperplaneSig]]. Codegen'd: the probe runs inside
  * whole-stage codegen directly over the scan, so a 99%-new batch never
  * shuffles at all. */
case class BloomContains(child: Expression, filter: Array[Byte], numHashes: Int)
    extends UnaryExpression {

  require(filter.nonEmpty && filter.length % 8 == 0)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val words: Array[Long] = BloomFilter.fromBytes(filter)
  private def numBits: Int = filter.length * 8

  override def nullSafeEval(input: Any): Any =
    BloomFilter.mightContain(words, numBits, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomFilter.mightContain($wordsRef, $numBits, $numHashes, $c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomContains =
    copy(child = c)
}

object BloomContains {
  def apply(h: Column, filter: Array[Byte], numHashes: Int): Column =
    GraftShims.toColumn(
      BloomContains(GraftShims.toExpression(h), filter, numHashes))
}
