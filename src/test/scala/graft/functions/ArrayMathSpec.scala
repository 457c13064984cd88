package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayMathSpec extends SparkSpec {

  test("native dot product matches the HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val out = df.select(
      ArrayMath.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(out(0).getDouble(0) == 32.0)
  }

  test("native dot participates in whole-stage codegen") {
    // non-foldable source so ConvertToLocalRelation can't pre-evaluate
    val df = spark.range(4)
      .selectExpr("array(cast(id as double), 2.0d) as a", "array(3.0d, 4.0d) as b")
      .select(ArrayMath.dot(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // "*" = whole-stage codegen
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(8.0, 11.0, 14.0, 17.0))
  }

  test("md5_prefix64 equals conv(substring(md5)) bit-for-bit") {
    import spark.implicits._
    val strs = (0 until 2000).map(i => s"probe-$i-${"x" * (i % 17)}")
    val df = strs.toDF("s")
    val out = df.select(
      graft.operators.TextOps.hash64(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(ArrayMath.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }
}
