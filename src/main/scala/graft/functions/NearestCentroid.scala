package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment for IVF-style ANN: index/indices of the
  * nearest centroid(s) by squared L2 distance. Centroid matrix lives in
  * the operator (same rationale as [[HyperplaneSig]]: literal-tree
  * expression encodings of k×d constants make Catalyst the bottleneck)
  * and ships into generated code via `addReferenceObj` — the expression
  * is fully codegen'd (an earlier CodegenFallback version made the
  * interpreted per-row eval the dominant cost of every encode pass:
  * ann_pq_topk spent ~4 s/run in boxed argmin loops).
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
    nprobe: Int, scale: Double) extends UnaryExpression {

  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
  require(scale > 0, "quantization scale must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"unsupported embedding type $t")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], centroids, nprobe,
      scale, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "long[][]")
    val fl = if (isFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NearestCentroid.assign(
         |  $c, $cents, $nprobe, $scale, $fl);""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  def apply(embedding: Column, centroids: Array[Array[Long]], nprobe: Int): Column =
    GraftShims.toColumn(
      NearestCentroid(GraftShims.toExpression(embedding), centroids, nprobe,
        HyperplaneSig.QuantScale))

  /** Shared by interpreted eval and generated code: quantize, exact-Long
    * squared distances, selection of the `nprobe` smallest with
    * ties-to-lower-id — primitive loops, no boxing, no sort. */
  def assign(arr: ArrayData, centroids: Array[Array[Long]], nprobe: Int,
      scale: Double, isFloat: Boolean): ArrayData = {
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
    val k = centroids.length
    val d2 = new Array[Long](k)
    var c = 0
    while (c < k) {
      val ct = centroids(c)
      var s = 0L
      var j = 0
      while (j < n) { val t = q(j) - ct(j); s += t * t; j += 1 }
      d2(c) = s
      c += 1
    }
    // nprobe smallest by (distance, id): repeated strict-min selection —
    // the first occurrence of the minimum IS the lowest id
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestD = Long.MaxValue
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && d2(c2) < bestD) { best = c2; bestD = d2(c2) }
        c2 += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}
