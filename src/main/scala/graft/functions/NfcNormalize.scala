package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass a curation pipeline runs BEFORE dedup and
  * tokenization (decomposed "e"+U+0301 and precomposed "é" must hash,
  * shingle, and tokenize identically, or near-dup recall silently drops
  * on mixed-encoder corpora — the exact divergence class the BPE
  * unicode contract documents). Spark ships no normalizer function; the
  * JDK's `java.text.Normalizer` is the reference implementation of
  * UAX #15, and DuckDB's `nfc_normalize` implements the same public
  * algorithm — which is what makes this expression oracle-checkable
  * cross-engine. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  /** Shared by interpreted eval and codegen. Fast path: NFC quick-check
    * YES (all-ASCII and most already-composed text) skips the copy. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    GraftShims.toColumn(NfcNormalize(GraftShims.toExpression(c)))
}
