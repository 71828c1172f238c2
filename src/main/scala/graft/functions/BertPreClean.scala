package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The regex-free half of BERT's BasicTokenizer clean as ONE native
  * pass (the [[WordShingles]] discipline): control chars and Unicode
  * spaces → one ASCII space, format controls (Cf/Cn) deleted, CJK
  * ideographs and punctuation space-padded into their own tokens.
  *
  * Replaces four chained `regexp_replace` passes, each a full
  * java.util.regex scan plus a fresh string — measured to double
  * `wordpiece_tokenize_bert_basic` when the classes grew to the full
  * Unicode ranges. Every decision here is per-codepoint, so the four
  * passes fuse losslessly; padding punctuation BEFORE the caller's
  * lowercase/accent fold (the old chain padded after) is equally
  * lossless because no case mapping, accent fold or combining-mark
  * deletion ever produces or consumes a padded-class codepoint
  * (punctuation is caseless; the fold maps letters to letters; marks
  * are none of these). Range tables are THE definition — BpeOps renders
  * its oracle regexes from these same tuples, so engine and oracle
  * cannot drift.
  */
case class BertPreClean(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BertPreClean needs a string child, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n + 16)
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp < 0x80) {
        // ASCII fast path: ctl → space; punct !-/ :-@ [-` {-~ padded
        if (cp <= 0x1f || cp == 0x7f) sb.append(' ')
        else if ((cp >= 0x21 && cp <= 0x2f) || (cp >= 0x3a && cp <= 0x40) ||
            (cp >= 0x5b && cp <= 0x60) || (cp >= 0x7b && cp <= 0x7e)) {
          sb.append(' '); sb.append(cp.toChar); sb.append(' ')
        } else sb.append(cp.toChar)
        i += 1
      } else {
        if (BertPreClean.in(cp, BertPreClean.UniSpaceFlat)) sb.append(' ')
        else if (BertPreClean.in(cp, BertPreClean.UniDeleteFlat)) ()
        else if (BertPreClean.in(cp, BertPreClean.CjkFlat) ||
            BertPreClean.in(cp, BertPreClean.UniPunctFlat)) {
          sb.append(' '); sb.appendCodePoint(cp); sb.append(' ')
        } else sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): BertPreClean =
    copy(child = c)
}

object BertPreClean {
  def apply(text: Column): Column =
    GraftShims.toColumn(BertPreClean(GraftShims.toExpression(text)))

  /** CJK ideograph blocks BERT pads (each char its own token). */
  val CjkClass: Seq[(Int, Int)] = Seq((0x4e00, 0x9fff), (0x3400, 0x4dbf),
    (0xf900, 0xfaff), (0x20000, 0x2a6df))

  /** BERT `_is_punctuation` beyond ASCII as explicit literal ranges:
    * exactly the category-P* codepoints of U+2000–206F, U+3000–303F and
    * U+FF00–FFEF (per-codepoint agreement with the JDK category tables
    * is spec-pinned in BpeSpec). */
  val UniPunct: Seq[(Int, Int)] = Seq(
    (0x2010, 0x2027), (0x2030, 0x2043),
    (0x2045, 0x2051), (0x2053, 0x205e),
    (0x3001, 0x3003), (0x3008, 0x3011), (0x3014, 0x301f),
    (0x3030, 0x3030), (0x303d, 0x303d),
    (0xff01, 0xff03), (0xff05, 0xff0a), (0xff0c, 0xff0f),
    (0xff1a, 0xff1b), (0xff1f, 0xff20), (0xff3b, 0xff3d),
    (0xff3f, 0xff3f), (0xff5b, 0xff5b), (0xff5d, 0xff5d),
    (0xff5f, 0xff65))

  /** Unicode Zs of the same blocks — cleaned to a plain space. */
  val UniSpace: Seq[(Int, Int)] = Seq(
    (0x2000, 0x200a), (0x202f, 0x202f), (0x205f, 0x205f),
    (0x3000, 0x3000))

  /** Format controls (Cf plus the blocks' Cn) — deleted, not spaced. */
  val UniDelete: Seq[(Int, Int)] = Seq(
    (0x200b, 0x200f), (0x202a, 0x202e), (0x2060, 0x206f),
    (0xfeff, 0xfeff))

  private def flat(rs: Seq[(Int, Int)]): Array[Int] =
    rs.flatMap { case (a, b) => Seq(a, b) }.toArray
  private[functions] val CjkFlat = flat(CjkClass)
  private[functions] val UniPunctFlat = flat(UniPunct)
  private[functions] val UniSpaceFlat = flat(UniSpace)
  private[functions] val UniDeleteFlat = flat(UniDelete)

  /** Linear scan over (lo, hi) pairs — the tables hold ≤ 19 ranges and
    * only non-ASCII codepoints reach them. */
  private[functions] def in(cp: Int, flat: Array[Int]): Boolean = {
    var i = 0
    while (i < flat.length) {
      if (cp >= flat(i) && cp <= flat(i + 1)) return true
      i += 2
    }
    false
  }
}
