package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftShims

/** Random-hyperplane LSH signature as a native Catalyst expression.
  *
  * Why an Expression and not `functions._` composition: each signature bit
  * is sign(embedding · plane). Expressing D×B dot products as nested
  * `aggregate(zip_with(...))` over literal arrays builds an expression tree
  * with thousands of literal nodes — at that size Catalyst analysis +
  * codegen time dwarfs the actual math (measured: 14s → sub-second for
  * 2000×64-dim vectors at 64 planes). Here the plane matrix lives in the
  * expression object; evaluation is one tight loop per row.
  *
  * Input: array<float|double> embedding. Output: array<bigint>, one packed
  * signature per band (bit r of band b = sign of plane b*rowsPerBand+r).
  * Null embeddings yield null. Deterministic for a fixed seed.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]],
    rowsPerBand: Int) extends UnaryExpression with CodegenFallback {

  require(planes.nonEmpty && planes.length % rowsPerBand == 0,
    "planes must be a non-empty multiple of rowsPerBand")
  require(rowsPerBand >= 1 && rowsPerBand <= 64,
    "rowsPerBand must be in [1, 64]: Java's long shift masks to 6 bits, so" +
      " larger values would silently wrap signature bits")

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
    val v = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    else while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    val bands = planes.length / rowsPerBand
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(b * rowsPerBand + r)
        var dot = 0.0
        val d = math.min(n, p.length)
        var j = 0
        while (j < d) { dot += v(j) * p(j); j += 1 }
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
  /** Column builder: `bands` signatures of `rowsPerBand` bits each from a
    * seeded Gaussian plane matrix. */
  def apply(embedding: Column, dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(bands * rowsPerBand, dim)(rng.nextGaussian())
    GraftShims.toColumn(
      HyperplaneSig(GraftShims.toExpression(embedding), planes, rowsPerBand))
  }
}
