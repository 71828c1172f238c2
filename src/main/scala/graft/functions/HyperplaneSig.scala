package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftShims

/** Random-hyperplane LSH signature as a native Catalyst expression
  * (Charikar 2002 SimHash for cosine).
  *
  * Why an Expression and not `functions._` composition: each signature bit
  * is sign(embedding · plane). Expressing D×B dot products as nested
  * `aggregate(zip_with(...))` over literal arrays builds an expression tree
  * with thousands of literal nodes — at that size Catalyst analysis +
  * codegen time dwarfs the actual math (measured: 14s → sub-second for
  * 2000×64-dim vectors at 64 planes). Here the plane matrix lives in the
  * expression object; evaluation is one tight loop per row.
  *
  * Why INTEGER planes and a quantized input: the sign of a floating-point
  * dot product sitting near zero is one ulp away from flipping, so a
  * float pipeline can never be hash-compared against another engine.
  * Instead the embedding is quantized to q_j = floor(v_j·scale + 0.5)
  * (v·256 is exact — a power-of-two product never rounds — and the single
  * rounded add-0.5 is the same IEEE op on every engine) and the dot is
  * pure Long arithmetic against integer plane entries: bit-exact,
  * portable, and oracle-checkable, at the cost of quantization noise far
  * below the hyperplane test's own randomness.
  *
  * Input: array<float|double> embedding of length planes(i).length (a
  * mismatch raises — prefix-truncating would silently hash corrupt data).
  * Output: array<bigint>, one packed signature per band (bit r of band b =
  * sign of plane b*rowsPerBand+r). Null embeddings yield null.
  * Deterministic for a fixed seed.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Long]],
    rowsPerBand: Int, scale: Double) extends UnaryExpression with CodegenFallback {

  require(planes.nonEmpty && planes.length % rowsPerBand == 0,
    "planes must be a non-empty multiple of rowsPerBand")
  require(rowsPerBand >= 1 && rowsPerBand <= 64,
    "rowsPerBand must be in [1, 64]: Java's long shift masks to 6 bits, so" +
      " larger values would silently wrap signature bits")
  require(scale > 0, "quantization scale must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"unsupported embedding type $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dim = planes(0).length
    if (n != dim) {
      throw new IllegalArgumentException(
        s"HyperplaneSig dimension mismatch: embedding has $n elements, planes have $dim")
    }
    val q = new Array[Long](n)
    var i = 0
    if (isFloat) {
      while (i < n) { q(i) = math.floor(arr.getFloat(i).toDouble * scale + 0.5).toLong; i += 1 }
    } else {
      while (i < n) { q(i) = math.floor(arr.getDouble(i) * scale + 0.5).toLong; i += 1 }
    }
    val bands = planes.length / rowsPerBand
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        var dot = 0L
        var j = 0
        while (j < n) { dot += q(j) * p(j); j += 1 }
        if (dot >= 0) sig |= (1L << r)
        r += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSig = copy(child = c)
}

object HyperplaneSig {
  /** Quantization scale for embedding values: 2^8 (power of two, so
    * v·scale is exact in IEEE double). Embedding magnitudes up to ~2^45
    * stay exactly representable after scaling. */
  final val QuantScale: Double = 256.0

  /** Seeded integer plane matrix (bands·rowsPerBand × dim): Gaussian
    * directions rounded to small integers — public so the DuckDB oracle
    * embeds the identical entries as VALUES. */
  def planeMatrix(dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long): Array[Array[Long]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bands * rowsPerBand, dim)(math.round(rng.nextGaussian() * 4.0))
  }

  /** Column builder: `bands` signatures of `rowsPerBand` bits each from a
    * seeded quantized-Gaussian plane matrix. */
  def apply(embedding: Column, dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long): Column =
    GraftShims.toColumn(
      HyperplaneSig(GraftShims.toExpression(embedding),
        planeMatrix(dim, bands, rowsPerBand, seed), rowsPerBand, QuantScale))
}
