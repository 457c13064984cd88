package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic histogram quantiles: bucket tables are partition-order
  * independent and SUM-merge, and quantile estimates land within one
  * bucket width of the exact percentile.
  */
class HistSpec extends SparkSpec {

  test("bucket table is repartition-independent and sum-merges") {
    import spark.implicits._
    val df = spark.range(10000).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 777).cast("double").as("v"))
    val a = Hist.buckets(df, col("v"), Seq("g"))
      .orderBy("g", "b").as[(String, Long, Long)].collect().toSeq
    val b = Hist.buckets(df.repartition(11, col("v")), col("v"), Seq("g"))
      .orderBy("g", "b").as[(String, Long, Long)].collect().toSeq
    assert(a == b)
    val d1 = df.filter(col("id") % 2 === 0)
    val d2 = df.filter(col("id") % 2 === 1)
    val merged = Hist.buckets(d1, col("v"), Seq("g"))
      .unionAll(Hist.buckets(d2, col("v"), Seq("g")))
      .groupBy("g", "b").agg(sum("n").as("n"))
      .orderBy("g", "b").as[(String, Long, Long)].collect().toSeq
    assert(merged == a, "hist(A) + hist(B) must equal hist(A union B)")
  }

  test("quantile estimates are within one bucket width of exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vals = (0 until 20000).map(_ => math.abs(rnd.nextGaussian()) * 120.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Hist.quantiles(
      Hist.buckets(df, col("v"), Seq("g")), Seq("g"), Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect().head
    val sorted = vals.sorted
    val bucketWidth = (1L << Hist.BucketBits) / 100.0 // cents -> value units
    Seq(50 -> got._2, 90 -> got._3, 99 -> got._4).foreach { case (p, cents) =>
      val est = cents / 100.0
      val exact = sorted((p * vals.size / 100.0).ceil.toInt.min(vals.size) - 1)
      assert(est <= exact && exact < est + bucketWidth,
        s"p$p estimate $est not within one bucket below exact $exact")
    }
  }

  test("quantile fold shuffles by group only (no global sort)") {
    import spark.implicits._
    val df = spark.range(1000).select(
      (col("id") % 5).cast("string").as("g"), col("id").cast("double").as("v"))
    val plan = Hist.quantiles(
      Hist.buckets(df, col("v"), Seq("g")), Seq("g"), Seq(50, 99))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning") && !plan.contains("SinglePartition"),
      s"quantile fold must not globally sort or single-partition:\n$plan")
  }
}
