package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Variable-axis bin index by binary search, as a native codegen'd
  * expression holding the edge array — the large-axis complement of
  * [[graft.hist.Variable]]'s CASE ladder.
  *
  * The ladder is O(edges) comparisons per row AND a literal expression
  * tree that grows with the edge count — the repo's measured Catalyst
  * cliff (SCALE.md: ~4k literal nodes made analysis/codegen dominate; the
  * same wall [[HyperplaneSig]] removed for LSH planes). The reference
  * accepts arbitrary-length edge sequences
  * (`/root/reference/src/dask_histogram/routines.py:444-447`) — a user
  * with percentile-derived edges (1k-10k bins, routine for latency
  * histograms) needs this path. Here the edges live in the expression
  * object (one broadcast-serialized double[], zero plan nodes) and each
  * row costs O(log edges): `java.util.Arrays.binarySearch`, exactly as
  * SURVEY.md §1.2 prescribed.
  *
  * Semantics are bit-identical to the ladder (the ≤64-edge path and the
  * DuckDB oracle keep it): right-exclusive [lo, hi) bins 1..n, underflow
  * 0, overflow n+1, NaN/NULL→overflow, and the optional NumPy
  * upper-inclusive last bin. One IEEE subtlety: `binarySearch` orders by
  * `Double.compare`, where -0.0 < 0.0, while the ladder compares IEEE
  * (-0.0 == 0.0) — [[VariableBinIndex.bin]] canonicalizes -0.0 before
  * searching so an edge at zero bins identically on both paths.
  */
case class VariableBinIndex(child: Expression, edges: Array[Double],
    upperInclusive: Boolean) extends UnaryExpression {

  require(edges.length >= 2, "VariableBinIndex needs >= 2 edges")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    VariableBinIndex.bin(edges, input.asInstanceOf[Double], upperInclusive)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val edgesRef = ctx.addReferenceObj("edges", edges, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VariableBinIndex.bin($edgesRef, $c, $upperInclusive);")
  }

  override protected def withNewChildInternal(c: Expression): VariableBinIndex =
    copy(child = c)
}

object VariableBinIndex {
  /** Shared by interpreted eval, codegen, and tests. `edges` strictly
    * increasing, length n+1 for n bins. */
  def bin(edges: Array[Double], value: Double, upperInclusive: Boolean): Long = {
    val n = edges.length - 1
    if (java.lang.Double.isNaN(value)) return n + 1L
    // IEEE-canonicalize signed zero: Double.compare (binarySearch's order)
    // puts -0.0 below 0.0, but bin membership must use IEEE equality
    val d = if (value == 0.0d) 0.0d else value
    val last = edges(n)
    if (upperInclusive) {
      if (d > last) return n + 1L
      if (d == last) return n.toLong
    } else if (d >= last) return n + 1L
    if (d < edges(0)) return 0L
    val res = java.util.Arrays.binarySearch(edges, d)
    // exact hit at edge i opens bin i+1; otherwise the insertion point IS
    // the 1-based bin (edges(p-1) < d < edges(p))
    if (res >= 0) res + 1L else (-res - 1).toLong
  }

  def apply(value: Column, edges: Array[Double], upperInclusive: Boolean): Column =
    GraftShims.toColumn(
      VariableBinIndex(GraftShims.toExpression(value), edges, upperInclusive))
}
