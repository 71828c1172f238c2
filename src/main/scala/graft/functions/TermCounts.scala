package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document length + per-term occurrence counts over a FIXED query
  * vocabulary, in one native codegen'd pass: returns
  * `array<int>` = [dl, count(vocab(0)), ..., count(vocab(V-1))].
  *
  * The relational alternative — `explode(split(text)) → filter(isin) →
  * groupBy(doc, term).count()` — tokenizes the corpus into one row PER
  * TOKEN and shuffles every query-term hit to count it. For a handful of
  * query terms (the BM25 shape, [[graft.ops.SearchOps.bm25TopK]]) the
  * whole tf computation is a per-document scalar pass: no explode, no
  * (doc, term) exchange, corpus text read exactly once per consumer.
  * Token semantics match [[MarkerCount]] and the split-based form
  * exactly: single-space delimiters, leading/trailing/adjacent empties
  * kept (Java `split(" ", -1)`, DuckDB `string_split`); dl = token count.
  */
case class TermCounts(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  require(vocab.nonEmpty, "TermCounts needs a non-empty vocabulary")
  require(vocab.distinct.size == vocab.size, "TermCounts vocab must be distinct")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val index: java.util.HashMap[String, Integer] =
    TermCounts.buildIndex(vocab)

  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[UTF8String].toString, index, vocab.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("termIndex", index,
      "java.util.HashMap<String, Integer>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c.toString(), " +
        s"$idxRef, ${vocab.size});")
  }

  override protected def withNewChildInternal(c: Expression): TermCounts =
    copy(child = c)
}

object TermCounts {
  def buildIndex(vocab: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (t, i) => m.put(t, Integer.valueOf(i)) }
    m
  }

  /** Shared by interpreted eval and codegen: single scan, no token array.
    * Slot 0 is the document length (token count); slot 1+i the count of
    * vocab term i. */
  def compute(text: String, index: java.util.HashMap[String, Integer],
      vocabSize: Int): ArrayData = {
    val out = new Array[Int](vocabSize + 1)
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        out(0) += 1
        val hit = index.get(text.substring(start, i))
        if (hit != null) out(hit.intValue() + 1) += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, vocab: Seq[String]): Column =
    GraftShims.toColumn(TermCounts(GraftShims.toExpression(text), vocab))
}
