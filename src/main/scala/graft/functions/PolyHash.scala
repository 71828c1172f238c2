package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: h ← (h*31 + codepoint) mod p over
  * the string's codepoints, p = 1e9+7 — an ENGINE-PORTABLE hash (the
  * DuckDB oracle replicates it with `list_reduce` over
  * `unicode(substr(...))`), unlike xxhash64. Native + codegen'd. The
  * 31-bit range keeps downstream (h*a+b) arithmetic under 2^62. */
case class PolyHash(child: Expression, mult: Long = 31L) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString, mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hash($c.toString(), ${mult}L);")

  override protected def withNewChildInternal(c: Expression): PolyHash =
    copy(child = c)
}

object PolyHash {
  final val P = 1000000007L

  /** Shared by interpreted eval, codegen, and driver-side tests.
    * Iterates codepoints, matching DuckDB's per-character unicode(). */
  def hash(s: String, mult: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column = apply(c, 31L)
  def apply(c: Column, mult: Long): Column =
    GraftShims.toColumn(PolyHash(GraftShims.toExpression(c), mult))

  /** The identical recurrence as DuckDB SQL — the ONE emitter every
    * oracle uses (four hand-inlined copies drifted apart is exactly the
    * failure mode the Sql-twin design exists to prevent). */
  def sql(c: String, mult: Long = 31L, p: Long = P): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($c) + 1),
       |    i -> CAST(unicode(substr($c, CAST(i AS INT), 1)) AS BIGINT))),
       |  (acc, ch) -> (acc * $mult + ch) % $p)""".stripMargin
}
