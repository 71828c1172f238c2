package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity over two numeric array columns as one native pass.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * composition: HOF lambdas evaluate interpreted, per element, per
  * invocation — measured 147 s for 4M pairs × 64 dims at sf0.1; this
  * expression is a plain double loop (sub-second for the same work).
  *
  * Float discipline: accumulates dot, |a|², |b|² sequentially in index
  * order in double precision — bit-identical to the three
  * `list_dot_product(CAST(x AS DOUBLE[]), …)` sums the DuckDB oracle
  * computes, so `round(cos, 6)` hash-matches remain exact.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemIsFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"unsupported embedding type $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // prefix-truncating a mismatch would return a plausible-looking score
    // over corrupt embedding data; fail loudly instead
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"CosineSim dimension mismatch: ${a.numElements()} vs ${b.numElements()}")
    }
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Same tight loop, emitted into whole-stage codegen (no interpreted
    * fallback, no boxing on the 4M-pairs hot path). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat(i)" else s"$a.getDouble(i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat(i)" else s"$b.getDouble(i)"
      s"""
         |int n = $a.numElements();
         |if ($b.numElements() != n) {
         |  throw new IllegalArgumentException(
         |    "CosineSim dimension mismatch: " + n + " vs " + $b.numElements());
         |}
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double x = $getA;
         |  double y = $getB;
         |  dot += x * y; na += x * x; nb += y * y;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    GraftShims.toColumn(CosineSim(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
