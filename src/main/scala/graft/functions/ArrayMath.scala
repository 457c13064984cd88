package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ArrayExpressions

/** Stable API over the native array expressions
  * (`org.apache.spark.sql.graft.DotProduct`): codegen'd dot product and
  * norm for `array<double>` columns.
  */
object ArrayMath {

  /** Whole-stage-codegen'd dot product; left-to-right double fold. */
  def dot(a: Column, b: Column): Column = ArrayExpressions.dot(a, b)

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))
}
