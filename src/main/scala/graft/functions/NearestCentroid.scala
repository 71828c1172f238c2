package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment for IVF-style ANN: index/indices of the
  * nearest centroid(s) by squared L2 distance. Centroid matrix lives in
  * the operator (same rationale as [[HyperplaneSig]]: literal-tree
  * expression encodings of k×d constants make Catalyst the bottleneck).
  *
  * Centroid entries are INTEGERS and the input embedding is quantized with
  * [[HyperplaneSig.QuantScale]] (floor(v·scale + 0.5)), so the whole
  * assignment is exact Long arithmetic — deterministic, engine-portable,
  * and DuckDB-oracle-checkable; a float distance near a Voronoi boundary
  * would be one ulp from assigning a different cell. Ties break toward the
  * lower centroid id on both engines.
  *
  * Embedding length must equal the centroid dimension (mismatch raises —
  * prefix truncation would silently assign corrupt data).
  *
  * Returns the `nprobe` nearest centroid ids as array<int> (nprobe=1 for
  * corpus assignment, >1 for query-side multi-probe).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Long]],
    nprobe: Int, scale: Double) extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
  require(scale > 0, "quantization scale must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"unsupported embedding type $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dim = centroids(0).length
    if (n != dim) {
      throw new IllegalArgumentException(
        s"NearestCentroid dimension mismatch: embedding has $n elements, centroids have $dim")
    }
    val q = new Array[Long](n)
    var i = 0
    if (isFloat) {
      while (i < n) { q(i) = math.floor(arr.getFloat(i).toDouble * scale + 0.5).toLong; i += 1 }
    } else {
      while (i < n) { q(i) = math.floor(arr.getDouble(i) * scale + 0.5).toLong; i += 1 }
    }
    val d2 = new Array[Long](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var s = 0L
      var j = 0
      while (j < n) { val t = q(j) - ct(j); s += t * t; j += 1 }
      d2(c) = s
      c += 1
    }
    // indices of nprobe smallest distances (ties -> lower centroid id)
    val idx = d2.indices.sortBy(i => (d2(i), i)).take(nprobe).toArray
    new GenericArrayData(idx)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  def apply(embedding: Column, centroids: Array[Array[Long]], nprobe: Int): Column =
    GraftShims.toColumn(
      NearestCentroid(GraftShims.toExpression(embedding), centroids, nprobe,
        HyperplaneSig.QuantScale))
}
