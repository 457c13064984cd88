package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector dot product (SURVEY §2.9's
  * custom-extension seam): a whole-stage-codegen'd tight loop over
  * `ArrayData`, so a declarative similarity join keeps the dot inside
  * generated code instead of interpreted higher-order functions
  * (`aggregate(zip_with(...))`, measured ~10x slower in this repo).
  *
  * Lives under `org.apache.spark.sql` because `ExpectsInputTypes`'
  * `AbstractDataType` and the Column<->Expression bridge
  * (`ExpressionUtils`) are `private[sql]` — the same pattern public Spark
  * extension libraries use. The stable user-facing API is
  * `graft.functions.ArrayMath`.
  *
  * Semantics: left-to-right double accumulation over min(len(a), len(b))
  * — identical fold order to the HOF formulation and DuckDB's
  * `list_dot_product` on DOUBLE[], so oracle parity is preserved.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayExpressions {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def md5Prefix64(c: Column): Column =
    ExpressionUtils.column(Md5Prefix64(ExpressionUtils.expression(c)))

  def winnowFingerprints(c: Column): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(c)))

  def shingleHashes(c: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashArray(ExpressionUtils.expression(c), n))

  def shingleHashSeq(c: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashSeq(ExpressionUtils.expression(c), n))

  def repetitionStats(c: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c)))

  def nonAlnumSpaceCount(c: Column): Column =
    ExpressionUtils.column(NonAlnumSpaceCount(ExpressionUtils.expression(c)))

  def asciiTokenCount(c: Column): Column =
    ExpressionUtils.column(AsciiTokenCount(ExpressionUtils.expression(c)))

  def simhashBits(c: Column, bits: Int): Column =
    ExpressionUtils.column(SimhashBits(ExpressionUtils.expression(c), bits))

  def minhashRegisters(c: Column): Column =
    ExpressionUtils.column(MinhashRegisters(ExpressionUtils.expression(c)))

  /** Skew-bounded `collect_list` over a LONG column: stops accumulating past
    * `cap + 1` elements. Lossless when the caller filters groups by an exact
    * count <= cap before reading the list (see CappedCollectLong).
    */
  def cappedCollectLong(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      CappedCollectLong(ExpressionUtils.expression(c), cap).toAggregateExpression())
}
