package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Monotone range-bucket assignment bucket(v) = #{b ∈ bounds : b < v}
  * over a NON-DECREASING bounds array, as a native codegen'd binary
  * search — the [[VariableBinIndex]] treatment for boundaries that are
  * COLUMN data (the broadcast one-row sketch-quantile relation,
  * [[graft.ops.LayoutOps.rangeBoundsDf]]) rather than driver literals.
  *
  * Why not the `aggregate(bounds, …)` HOF fold: at 256 buckets the
  * inlined 255-element CASE fold blows the JVM's 64 KB generated-method
  * limit and the whole stage silently falls back to interpreted
  * execution (the SCALE.md CASE-fan-out cliff, measured again on the
  * round-10 gridrank soak) — and it is O(buckets) per row besides. This
  * expression is one static call, O(log buckets), and keeps the stage
  * inside whole-stage codegen.
  *
  * Semantics are EXACTLY the fold's (GridWindowSpec pins equality):
  * IEEE `<` compares (NaN value → 0 matches "v > b never true"), a null
  * value counts as no boundary crossed, and a null-bounds array yields
  * bucket 0. BOUNDS CONTRACT: entries are either ALL non-null or ALL
  * null — exactly what [[graft.ops.LayoutOps.rangeBoundsDf]] produces
  * (its empty-input guard nulls the whole array at once); the binary
  * search checks only the first entry, so a MIXED-null array is
  * outside the contract (it would read null slots as 0.0 and break
  * monotonicity — construct bounds through rangeBoundsDf). Output is
  * never null.
  */
case class RangeBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val b = right.eval(input)
    if (v == null || b == null) 0L
    else RangeBucket.bucket(b.asInstanceOf[ArrayData],
      v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val resultCode =
      code"""
        ${l.code}
        ${r.code}
        long ${ev.value} = 0L;
        if (!${l.isNull} && !${r.isNull}) {
          ${ev.value} = graft.functions.RangeBucket.bucket(
            ${r.value}, ${l.value});
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RangeBucket =
    copy(left = newLeft, right = newRight)
}

object RangeBucket {
  /** Shared by interpreted eval, codegen, and specs: lower-bound count
    * of elements `< v` in a non-decreasing double array; null entries
    * (the empty-input guard bounds) and NaN values cross nothing. */
  def bucket(bounds: ArrayData, v: Double): Long = {
    val n = bounds.numElements()
    if (n == 0 || bounds.isNullAt(0)) return 0L
    if (java.lang.Double.isNaN(v)) return 0L
    var lo = 0
    var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (bounds.getDouble(m) < v) lo = m + 1 else hi = m
    }
    lo.toLong
  }

  def apply(value: Column, bounds: Column): Column =
    GraftShims.toColumn(RangeBucket(
      GraftShims.toExpression(value), GraftShims.toExpression(bounds)))
}
