package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The `bits`-bit SimHash of a document as ONE map-side expression:
  * whitespace words (TextOps.words semantics via `wordsJvm`), md5-prefix64
  * per word occurrence, per-bit sign vote over the word MULTISET, signature
  * bit j set iff the vote is positive.
  *
  * Replaces the explode + `bits`-sum groupBy formulation in
  * `Dedup.simhash` — that shape shuffles one row per WORD OCCURRENCE of
  * the corpus and evaluates `bits` shift/mask/sum aggregate expressions
  * per row (60 x corpus-word-count expression evaluations before the
  * signature even exists). As an expression the signature is computed
  * where the document row already is: map-side, no exchange, one md5 per
  * word and one popcount-style tally.
  *
  * Exactly the groupBy path's integers (SimhashParitySpec holds them
  * equal): vote_j = sum over words of ((h >> j) & 1) * 2 - 1
  *               = 2 * ones_j - n_words,
  * so vote_j > 0 iff 2 * ones_j > n_words; a doc tokenizes to at least
  * one word (`split(trim(s), "\s+", -1)` yields [""] on empty text), so
  * every doc gets a row on both paths.
  */
case class SimhashBits(child: Expression, bits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    SimhashBits.simhash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimhashBits.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashBits {

  def simhash(text: UTF8String, bits: Int): Long = {
    val words = graft.operators.TextOps.wordsJvm(text.toString)
    val md = Md5Prefix64.threadLocalMd()
    val ones = new Array[Int](bits)
    var i = 0
    while (i < words.length) {
      val h = Md5Prefix64.hash(md,
        words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < bits) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    val n = words.length
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2L * ones(j) > n) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
