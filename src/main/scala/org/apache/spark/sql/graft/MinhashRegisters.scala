package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** All `Dedup.NumHashes` MinHash registers of a shingle-hash array in ONE
  * pass: register i = min over the array of (h * hashA(i) + hashB(i)) % P.
  *
  * Replaces the 12 interpreted `array_min(transform(hs, ...))` HOF columns
  * in `Dedup.minhashSignaturesRowwise` — higher-order functions are
  * CodegenFallback in Spark, so that shape paid 12 interpreted lambda
  * sweeps and 12 intermediate array allocations PER ROW. This expression
  * keeps the rowwise path's defining property (map-only, zero shuffle, no
  * corpus-sized shingle table) while running the register arithmetic in a
  * tight generated loop.
  *
  * Exactly the groupBy path's integers (the existing rowwise/groupBy
  * parity specs cover the arithmetic; h < P ~ 2^31 and hashA/hashB are
  * small, so h * a + b stays far below 2^63 — no overflow, `%` yields the
  * non-negative remainder on both paths). Empty input -> empty array, so
  * the caller's `size(...) > 0` zero-shingle filter behaves exactly like
  * the old `size(hs) > 0`.
  */
case class MinhashRegisters(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_registers"

  override def nullSafeEval(input: Any): Any =
    MinhashRegisters.registers(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.MinhashRegisters.registers($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashRegisters {

  def registers(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    if (n == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val k = graft.operators.Dedup.NumHashes
    val p = graft.operators.Dedup.P
    val regs = new Array[Long](k)
    java.util.Arrays.fill(regs, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * graft.operators.Dedup.hashA(i) +
          graft.operators.Dedup.hashB(i)) % p
        if (v < regs(i)) regs(i) = v
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(regs)
  }
}
