package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All four within-document repetition signals in ONE pass over the text:
  * total / distinct 3-gram shingle counts (same hashing as
  * `ShingleHashArray`, multiplicity preserved for the total) plus word
  * count and the top word's multiplicity.
  *
  * Replaces q_repetition_filter's posexplode + lead()-window + two
  * groupBys + join — five operators, three exchanges — with a map-only
  * projection. NULL (row filtered by the caller) for documents with fewer
  * than 3 words, matching the lead-guard semantics of the SQL oracle.
  */
case class RepetitionStats(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.RepetitionStats.stats($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** (n_grams, n_unique, n_words, top_word_n) or null for < 3 words. */
  def stats(text: UTF8String): InternalRow = {
    val words = graft.operators.TextOps.wordsJvm(text.toString)
    if (words.length < 3) return null
    val md = Md5Prefix64.threadLocalMd()
    val counts = new java.util.HashMap[String, Long]()
    val wh = new Array[Long](words.length)
    var top = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val c = counts.merge(w, 1L, (a, b) => a + b)
      if (c > top) top = c
      wh(i) = Md5Prefix64.hash(md,
        w.getBytes(java.nio.charset.StandardCharsets.UTF_8)) %
        graft.operators.Dedup.P
      i += 1
    }
    val B = graft.operators.Dedup.ShingleB
    val P = graft.operators.Dedup.P
    val seen = new java.util.HashSet[java.lang.Long]()
    val nGrams = words.length - 2
    i = 0
    while (i < nGrams) {
      seen.add(((wh(i) * B + wh(i + 1)) % P * B + wh(i + 2)) % P)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nGrams.toLong, seen.size.toLong, words.length.toLong, top))
  }
}
