package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.DotProduct

class ExtensionsSpec extends SparkSpec {

  test("dot_product is callable from SQL once registered") {
    // the shared test session predates GraftExtensions; register through
    // the same function-registry path injectFunction uses at session build,
    // and drop afterwards — the session registry is shared across suites
    val id = new FunctionIdentifier("dot_product")
    spark.sessionState.functionRegistry.registerFunction(
      id,
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    try {
      val out = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(out == 11.0)
    } finally spark.sessionState.functionRegistry.dropFunction(id)
  }

  test("every GraftExtensions function is SQL-callable (same builders)") {
    // registering the REAL builder list into the shared session's registry
    // exercises exactly what injectFunction wires at session build
    val fns = org.apache.spark.sql.graft.GraftExtensions.functions
    fns.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    try {
      assert(spark.sql("SELECT md5_prefix64('a') AS h")
        .collect().head.getLong(0) ==
        org.apache.spark.sql.graft.Md5Prefix64.hash("a".getBytes("UTF-8")))
      assert(spark.sql("SELECT size(winnow_fingerprints('abcdefghij')) AS n")
        .collect().head.getInt(0) >= 1)
      assert(spark.sql("SELECT size(shingle_hashes('a b c d', 3)) AS n")
        .collect().head.getInt(0) == 2)
      assert(spark.sql("SELECT repetition_stats('a b c d').n_grams AS g")
        .collect().head.getLong(0) == 2L)
      assert(spark.sql("SELECT size(shingle_hash_seq('a b a b a', 3)) AS n")
        .collect().head.getInt(0) == 3)
      // ordered variant keeps duplicates; distinct variant collapses them
      assert(spark.sql(
        "SELECT size(shingle_hash_seq('a b a b a b a', 3)) AS s, " +
          "size(shingle_hashes('a b a b a b a', 3)) AS d")
        .collect().map(r => (r.getInt(0), r.getInt(1))).head == ((5, 2)))
      // fewer words than a shingle: empty set / null stats
      assert(spark.sql("SELECT size(shingle_hashes('a b', 3)) AS n")
        .collect().head.getInt(0) == 0)
      assert(spark.sql("SELECT repetition_stats('a b') IS NULL AS z")
        .collect().head.getBoolean(0))
    } finally fns.foreach { case (id, _, _) =>
      spark.sessionState.functionRegistry.dropFunction(id)
    }
  }
}
