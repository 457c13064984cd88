package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The distinct word-n-gram shingle hashes of a document as ONE
  * expression: whitespace words, md5-prefix64 mod P per word, positional
  * rolling composition ((wh0*B + wh1) % P * B + wh2) % P ..., distinct,
  * ascending.
  *
  * Replaces the posexplode + lead()-window formulation in
  * `Dedup.shingleHashes` — that shape pays a shuffle + sort on (id, pos)
  * before any dedup work starts, in EVERY consumer (MinHash signatures,
  * LSH candidates, n-gram Jaccard, contamination). As an expression the
  * shingle set is computed where the document row already is: map-side,
  * no exchange, and the per-doc set dedup is free. Semantics are exactly
  * `Dedup.shinglesSql`'s: fewer than n words -> empty set (the doc drops
  * out on explode), all arithmetic under 2^51 so the DuckDB oracle replays
  * identical integers.
  */
case class ShingleHashArray(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashArray.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHashArray.hashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashArray {

  /** Per-word md5-prefix64 % P hashes, tokenized exactly like
    * `TextOps.words` (shared with `ShingleHashSeq`).
    */
  private[graft] def wordHashes(text: UTF8String): Array[Long] = {
    // identical tokenization to TextOps.words = split(trim(text), "\s+")
    val words = graft.operators.TextOps.wordsJvm(text.toString)
    val md = Md5Prefix64.threadLocalMd()
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      wh(i) = Md5Prefix64.hash(md,
        words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)) %
        graft.operators.Dedup.P
      i += 1
    }
    wh
  }

  /** Composed hash of the n-gram starting at word index i. */
  private[graft] def composeAt(wh: Array[Long], i: Int, n: Int): Long = {
    var h = wh(i)
    var j = 1
    while (j < n) {
      h = (h * graft.operators.Dedup.ShingleB + wh(i + j)) % graft.operators.Dedup.P
      j += 1
    }
    h
  }

  /** Distinct composed shingle hashes, ascending; empty for < n words. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val wh = wordHashes(text)
    if (wh.length < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= wh.length - n) {
      set.add(composeAt(wh, i, n))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
