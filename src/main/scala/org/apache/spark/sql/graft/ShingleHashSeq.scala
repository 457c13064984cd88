package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The ORDERED word-n-gram shingle hashes of a document: element i is the
  * composed hash of the n-gram starting at word i (0-based), multiplicity
  * preserved. `posexplode` over it yields (start_pos, hash) pairs — the
  * positional index the duplicated-span operator needs to compute token
  * coverage (Lee et al. 2021 "Deduplicating Training Data..." ExactSubstr,
  * re-expressed over word n-grams).
  *
  * Same tokenization / word hashing / rolling composition as
  * `ShingleHashArray` (shared helpers — change one and the other follows);
  * the only difference is no distinct and stable positional order. Fewer
  * than n words -> empty array. Map-side codegen'd, no exchange.
  */
case class ShingleHashSeq(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_seq"

  override def nullSafeEval(input: Any): Any =
    ShingleHashSeq.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHashSeq.hashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashSeq {

  /** Ordered composed shingle hashes; empty for < n words. */
  def hashes(text: UTF8String, n: Int): ArrayData = {
    val wh = ShingleHashArray.wordHashes(text)
    if (wh.length < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](wh.length - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = ShingleHashArray.composeAt(wh, i, n)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
