package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document winnowing fingerprints as ONE expression: the distinct
  * set of 16-window minima over char-8-gram md5-prefix hashes, ascending.
  *
  * Replaces the three-stage declarative formulation (explode one row per
  * char position -> shuffle on doc_id + sort for the running-min window ->
  * distinct shuffle) with a single map-side pass: per document the rolling
  * minimum runs over a monotone deque (O(L)), and the per-doc set dedup
  * happens in-expression, so `select(doc_id, explode(fps(text)))` needs NO
  * exchange at all — at 100 TB the fingerprint pass becomes scan-bound.
  * Semantics are byte-for-byte those of the SQL it replaces (positions
  * 1..max(L-7, 1); a shorter-than-8 doc hashes its whole text once —
  * matching `substr(text, pos, 8)` truncation in both engines).
  */
case class WinnowFingerprints(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // Scala 2.13 emits a static forwarder for the companion's `fps`, so
      // generated Java can call it directly
      s"${ev.value} = org.apache.spark.sql.graft.WinnowFingerprints.fps($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  val K = 8 // gram width (chars)
  val W = 16 // window width (grams)

  /** Distinct window-min fingerprints, ascending. */
  def fps(text: UTF8String): ArrayData = {
    // Positions count CODE POINTS: Spark's length()/substr() and DuckDB's
    // len()/substr() are character-based, and java.lang.String.length is
    // UTF-16 units — a non-BMP char (emoji) would shift every gram and
    // split surrogate pairs. Walk the UTF-8 buffer once to index the
    // code-point byte offsets, then hash byte SLICES of it: no String
    // round-trip, no per-gram re-scan (UTF8String.substring would walk
    // from byte 0 each call — O(L^2) per document).
    val bytes = text.getBytes
    val offs = new Array[Int](bytes.length + 1)
    var L = 0
    var o = 0
    while (o < bytes.length) {
      offs(L) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      L += 1
    }
    offs(L) = bytes.length
    val n = math.max(L - (K - 1), 1)
    val md = Md5Prefix64.threadLocalMd()
    val kh = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = offs(i)
      val until = offs(math.min(i + K, L))
      kh(i) = Md5Prefix64.hash(md, bytes, from, until - from)
      i += 1
    }
    // rolling min over a W-wide window via monotone deque: O(n) total
    val set = new java.util.TreeSet[java.lang.Long]()
    val dq = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!dq.isEmpty && dq.peekFirst() <= i - W) dq.pollFirst()
      while (!dq.isEmpty && kh(dq.peekLast()) >= kh(i)) dq.pollLast()
      dq.addLast(i)
      set.add(kh(dq.peekFirst()))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}
