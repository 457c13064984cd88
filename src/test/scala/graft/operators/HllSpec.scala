package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic HLL sketch: registers are partition-order independent,
  * register tables merge by element-wise max (the union = merge property
  * that makes daily sketches compose), and the folded estimate lands
  * within HLL's expected error band.
  */
class HllSpec extends SparkSpec {

  test("registers are identical under arbitrary repartitioning") {
    import spark.implicits._
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("g"), col("id").as("v"))
    val a = Hll.registers(df, col("v"), Seq("g"))
      .orderBy("g", "bucket").as[(String, Long, Long)].collect().toSeq
    val b = Hll.registers(df.repartition(17, col("v")), col("v"), Seq("g"))
      .orderBy("g", "bucket").as[(String, Long, Long)].collect().toSeq
    assert(a == b, "partial-agg order must not change any register")
    assert(a.forall { case (_, bucket, m) =>
      bucket >= 0 && bucket < Hll.Buckets && m >= 1 && m <= Hll.WBits + 1 })
  }

  test("union of register tables merges with max(m)") {
    import spark.implicits._
    val d1 = spark.range(0, 3000).select(lit("g").as("g"), col("id").as("v"))
    val d2 = spark.range(2000, 6000).select(lit("g").as("g"), col("id").as("v"))
    val merged = Hll.registers(d1, col("v"), Seq("g"))
      .unionAll(Hll.registers(d2, col("v"), Seq("g")))
      .groupBy("g", "bucket").agg(max("m").as("m"))
      .orderBy("bucket").as[(String, Long, Long)].collect().toSeq
    val direct = Hll.registers(d1.unionAll(d2), col("v"), Seq("g"))
      .orderBy("bucket").as[(String, Long, Long)].collect().toSeq
    assert(merged == direct,
      "sketch(A) max-merge sketch(B) must equal sketch(A union B)")
  }

  test("estimate tracks the true cardinality within the HLL error band") {
    import spark.implicits._
    // m=256 -> stddev ~ 1.04/sqrt(256) = 6.5%; assert a generous 4 sigma
    Seq(100L, 1000L, 20000L).foreach { n =>
      val df = spark.range(n).select(lit("g").as("g"), col("id").as("v"))
      val est = Hll.estimate(Hll.registers(df, col("v"), Seq("g")), Seq("g"))
        .as[(String, Double)].collect().head._2
      assert(math.abs(est - n) / n < 0.26,
        s"estimate $est too far from true $n")
    }
  }
}
