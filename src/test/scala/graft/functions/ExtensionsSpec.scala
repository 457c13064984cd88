package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.DotProduct

class ExtensionsSpec extends SparkSpec {

  test("dot_product is callable from SQL once registered") {
    // the shared test session predates GraftExtensions; register through
    // the same function-registry path injectFunction uses at session build
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    val out = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(out == 11.0)
  }
}
