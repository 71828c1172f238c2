package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd expression — the
  * record-linkage string metric (Winkler 1990, census name matching)
  * Spark has no function for. Semantics are pinned to the public
  * RapidFuzz/DuckDB implementation so the oracle can recompute it
  * verbatim (`jaro_winkler_similarity`): BYTE granularity over the
  * UTF-8 encoding (normalize first for Unicode-aware matching — see
  * [[NfcNormalize]]), match window ⌊max(|a|,|b|)/2⌋−1, transpositions
  * = mismatched matched-positions FLOOR-halved (the Apache-Commons /
  * RapidFuzz integer convention — a 3-cycle counts 1, not 1.5), prefix
  * bonus ℓ≤4 at p=0.1 applied only when
  * the Jaro score exceeds the 0.7 boost threshold, and 0.0 when either
  * side is empty (including both — DuckDB's convention).
  *
  * Null in → null out; interpreted eval and codegen share one kernel. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.jw($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : JaroWinkler = copy(left = l, right = r)
}

object JaroWinkler {
  /** Shared kernel for interpreted eval and codegen. */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a(i) == b(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    // transpositions = mismatched matched-positions / 2, FLOORED —
    // the RapidFuzz/Apache-Commons convention DuckDB implements (a
    // 3-cycle like "012"/"120" counts 1, not 1.5)
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  def apply(a: Column, b: Column): Column =
    GraftShims.toColumn(JaroWinkler(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
