package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` over a LONG column that stops accumulating past `cap + 1`
  * elements — the skew guard for posting-list aggregation (the containment
  * stage's fused cool-shingle inverted index, DedupQueries.containmentDrops).
  *
  * Why a cap is LOSSLESS there: the consumer filters groups by an exact
  * companion `count(*)` before ever reading the list (only shingles with
  * doc-frequency <= cap are "cool"; hotter ones are dropped wholesale). So a
  * truncated list is only ever produced for groups the filter discards, while
  * any surviving group was never truncated: partial aggregation buffers hold
  * DISJOINT row subsets, so if the group total is <= cap no partial buffer
  * can exceed cap either, and merge concatenates exactly. Keeping cap + 1
  * (not cap) preserves the overflow evidence end-to-end — a result array
  * longer than cap can never be mistaken for a complete one.
  *
  * Why it matters at scale: plain `collect_list` materializes the FULL
  * posting list of every shingle in the aggregation buffer before the hot
  * filter runs — a corpus-wide boilerplate shingle at 100 TB is billions of
  * ids in one buffer. With the cap, every buffer is bounded by
  * `8 * (cap + 1)` bytes regardless of skew.
  */
case class CappedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  require(cap >= 0, s"cap must be non-negative, got $cap")

  override def prettyName: String = "capped_collect_long"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(
      buf: mutable.ArrayBuffer[Long], input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Long],
      other: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buf.length <= cap) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CappedCollectLong =
    copy(child = newChild)
}
