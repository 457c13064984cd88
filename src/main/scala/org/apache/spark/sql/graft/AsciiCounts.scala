package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass counters replacing two hot regex-count idioms. Both
  * are exact twins of `size(regexp_extract_all(text, pattern, 0))` for
  * their fixed pattern — the regex form materializes an ARRAY of every
  * match (an allocation per matched char) just to take its length, and ran
  * on every row of the corpus-scan quality/token paths (q_text_quality,
  * the keeper ranking, the curation manifests, the funnel quality stage,
  * q_token_count, packing). The oracle SQL keeps its regexp form — these
  * must produce identical integers, pinned by AsciiCountsParitySpec.
  *
  * Pattern semantics (Java regex, no UNICODE flags — what Spark's
  * regexp_extract_all compiles):
  *  - `[^A-Za-z0-9\s]`: one code point per match; `\s` is ASCII-only
  *    ([ \t\n\x0B\f\r]). Every non-ASCII code point matches.
  *  - TokenPattern `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`: greedy ASCII letter
  *    runs, ASCII digit runs, else one (possibly non-ASCII) code point.
  *
  * UTF-8 walk: ASCII bytes are classified directly; a non-ASCII lead byte
  * counts as ONE code point and its continuation bytes are skipped —
  * identical to the regex engine's per-code-point classes (Java character
  * classes match full code points, including supplementary ones).
  */
case class NonAlnumSpaceCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "non_alnum_space_count"
  override def nullSafeEval(input: Any): Any =
    AsciiCounts.nonAlnumSpace(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.AsciiCounts.nonAlnumSpace($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AsciiTokenCount(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ascii_token_count"
  override def nullSafeEval(input: Any): Any =
    AsciiCounts.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.AsciiCounts.tokens($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiCounts {

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** count of code points matching `[^A-Za-z0-9\s]`. */
  def nonAlnumSpace(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        if (!isLetter(b) && !isDigit(b) && !isSpace(b)) n += 1
        i += 1
      } else { // one non-ASCII code point: count it, skip continuations
        n += 1
        i += 1
        while (i < bytes.length && (bytes(i) & 0xC0) == 0x80) i += 1
      }
    }
    n
  }

  /** count of TokenPattern matches: letter runs + digit runs + single
    * non-alnum-space code points.
    */
  def tokens(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var n = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (isLetter(b)) {
        n += 1
        i += 1
        while (i < bytes.length && isLetter(bytes(i))) i += 1
      } else if (isDigit(b)) {
        n += 1
        i += 1
        while (i < bytes.length && isDigit(bytes(i))) i += 1
      } else if (b >= 0) {
        if (!isSpace(b)) n += 1
        i += 1
      } else {
        n += 1
        i += 1
        while (i < bytes.length && (bytes(i) & 0xC0) == 0x80) i += 1
      }
    }
    n
  }
}
