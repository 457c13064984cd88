package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-prefix hash as a single native expression: the value equals
  * `conv(substring(md5(s), 1, 15), 16, 10)::long` (= DuckDB
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`) but is computed straight
  * from the digest bytes — no hex-string materialization, no base-16
  * string parse. One MessageDigest instance per generated class (mutable
  * state), reset per row.
  *
  * First 15 hex chars = digest bytes 0..6 plus the high nibble of byte 7:
  * v = (b0..b6 as 56 bits) << 4 | (b7 >>> 4).
  */
case class Md5Prefix64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v =>
        s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
           |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
           |""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      val v = ctx.freshName("v")
      s"""
         |$md.reset();
         |byte[] $d = $md.digest($c.getBytes());
         |long $v = 0L;
         |for (int graft_i = 0; graft_i < 7; graft_i++) {
         |  $v = ($v << 8) | (((long) $d[graft_i]) & 0xffL);
         |}
         |$v = ($v << 4) | ((((long) $d[7]) & 0xf0L) >>> 4);
         |${ev.value} = $v;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {

  // One MessageDigest per thread for interpreted-path and helper callers —
  // getInstance per row is a JCA provider lookup on the hot path. (The
  // codegen path above hoists its own instance as generated-class state.)
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def threadLocalMd(): java.security.MessageDigest = localMd.get()

  /** The canonical 60-bit prefix extraction — the single source of truth
    * for the byte layout. ShingleHashArray / WinnowFingerprints /
    * RepetitionStats must call this, never re-implement the shift loop:
    * any layout change must hit all engines at once or oracle hash parity
    * silently breaks.
    */
  def hash(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    extract(md.digest(bytes))
  }

  /** Hash a slice without materializing it (gram hashing over a shared
    * byte buffer).
    */
  def hash(md: java.security.MessageDigest, bytes: Array[Byte],
           off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    extract(md.digest())
  }

  def hash(bytes: Array[Byte]): Long = hash(localMd.get(), bytes)

  private def extract(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
