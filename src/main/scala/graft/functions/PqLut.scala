package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-query PQ ADC lookup table as ONE native expression: entry
  * `j·k + c` = exact integer ||quantize(q_j) − book(j)(c)||² over
  * subspace j's lanes. The codebook matrix lives in the operator
  * (the [[HyperplaneSig]]/[[NearestCentroid]] rationale, measured
  * here too: the previous literal-tree encoding — 128 table entries
  * × 8 lanes of floor/cast/subtract/multiply nodes — cost ~2-4 s of
  * Catalyst optimizer+codegen time PER QUERY RUN before a single row
  * moved; as one operator-held-state node the plan carries a single
  * expression and the table is computed in a tight primitive loop).
  *
  * Quantization is floor(v·scale + 0.5) — identical to
  * [[NearestCentroid]], so encode and search live on one integer
  * grid and the DuckDB oracle replays both sides exactly.
  */
case class PqLut(child: Expression, books: Array[Array[Array[Long]]],
    scale: Double) extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebooks")
  require(scale > 0, "quantization scale must be positive")

  private val m = books.length
  private val k = books(0).length
  private val sub = books(0)(0).length
  require(books.forall(b => b.length == k && b.forall(_.length == sub)),
    s"ragged codebooks (want $m x $k x $sub)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"unsupported embedding type $t")
  }

  override def nullSafeEval(input: Any): Any =
    PqLut.compute(input.asInstanceOf[ArrayData], books, scale, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("books", books, "long[][][]")
    val fl = if (isFloat) "true" else "false"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqLut.compute($c, $bk, $scale, $fl);")
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

object PqLut {
  def apply(embedding: Column, books: Array[Array[Array[Long]]]): Column =
    GraftShims.toColumn(PqLut(GraftShims.toExpression(embedding), books,
      HyperplaneSig.QuantScale))

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, books: Array[Array[Array[Long]]],
      scale: Double, isFloat: Boolean): ArrayData = {
    val m = books.length
    val k = books(0).length
    val sub = books(0)(0).length
    val dim = m * sub
    val n = arr.numElements()
    if (n != dim) {
      throw new IllegalArgumentException(
        s"PqLut dimension mismatch: embedding has $n elements, books cover $dim")
    }
    val q = new Array[Long](n)
    var i = 0
    if (isFloat) {
      while (i < n) { q(i) = math.floor(arr.getFloat(i).toDouble * scale + 0.5).toLong; i += 1 }
    } else {
      while (i < n) { q(i) = math.floor(arr.getDouble(i) * scale + 0.5).toLong; i += 1 }
    }
    val out = new Array[Long](m * k)
    var j = 0
    while (j < m) {
      val base = j * sub
      val bj = books(j)
      var c = 0
      while (c < k) {
        val cent = bj(c)
        var s = 0L
        var l = 0
        while (l < sub) { val t = q(base + l) - cent(l); s += t * t; l += 1 }
        out(j * k + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
