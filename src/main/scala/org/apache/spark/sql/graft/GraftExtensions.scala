package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works in any session built
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

  /** The engine's native SQL functions — exposed as data so tests can
    * register the same builders into an existing session's registry.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }),
    (new FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5Prefix64].getName, "md5_prefix64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "md5_prefix64 takes exactly 1 argument")
        Md5Prefix64(children.head)
      }),
    (new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "winnow_fingerprints takes exactly 1 argument")
        WinnowFingerprints(children.head)
      }),
    (new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashArray].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hashes takes (text, n)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes n must be an integer literal, got $other")
        }
        ShingleHashArray(children.head, n)
      }),
    (new FunctionIdentifier("shingle_hash_seq"),
      new ExpressionInfo(classOf[ShingleHashSeq].getName, "shingle_hash_seq"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hash_seq takes (text, n)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hash_seq n must be an integer literal, got $other")
        }
        ShingleHashSeq(children.head, n)
      }),
    (new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "repetition_stats takes exactly 1 argument")
        RepetitionStats(children.head)
      }))
}
