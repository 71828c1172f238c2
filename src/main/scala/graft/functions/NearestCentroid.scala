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
  * Returns the `nprobe` nearest centroid ids as array<int> (nprobe=1 for
  * corpus assignment, >1 for query-side multi-probe).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)

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
    val v = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    else while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    val d2 = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      var s = 0.0
      val d = math.min(n, ct.length)
      var j = 0
      while (j < d) { val t = v(j) - ct(j); s += t * t; j += 1 }
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
  def apply(embedding: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    GraftShims.toColumn(
      NearestCentroid(GraftShims.toExpression(embedding), centroids, nprobe))
}
