package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace tokens belonging to a fixed marker vocabulary, as
  * one native codegen'd pass.
  *
  * Replaces `size(filter(split(text, " "), t => markers.contains(t)))`:
  * higher-order functions evaluate their lambda interpreted, per element,
  * per row — the exact per-row-hot-path pattern SCALE.md bans (langId
  * evaluates five of these per document, qualityScore another). Semantics
  * match the HOF form exactly: tokens = split on a single space with
  * trailing empties kept (Java `split(" ", -1)` — same as DuckDB
  * string_split), membership = exact string equality.
  */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  require(markers.nonEmpty, "MarkerCount needs a non-empty marker vocabulary")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val markerSet: java.util.HashSet[String] =
    MarkerCount.buildSet(markers)

  override def nullSafeEval(input: Any): Any =
    MarkerCount.countIn(input.asInstanceOf[UTF8String].toString, markerSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", markerSet,
      "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MarkerCount.countIn($c.toString(), $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): MarkerCount =
    copy(child = c)
}

object MarkerCount {
  def buildSet(markers: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](markers.size * 2)
    markers.foreach(s.add)
    s
  }

  /** Shared by interpreted eval and codegen. Scans the string once,
    * testing each single-space-delimited token (empties included) against
    * the set — no token array materialization. */
  def countIn(text: String, set: java.util.HashSet[String]): Int = {
    var count = 0
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (set.contains(text.substring(start, i))) count += 1
        start = i + 1
      }
      i += 1
    }
    count
  }

  def apply(text: Column, markers: Seq[String]): Column =
    GraftShims.toColumn(MarkerCount(GraftShims.toExpression(text), markers))
}
