package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch: registers are partition-order
  * independent, sketches merge by element-wise SUM (linearity), estimates
  * never underestimate, and unseen probes read 0.
  */
class CmsSpec extends SparkSpec {

  test("registers are identical under arbitrary repartitioning") {
    import spark.implicits._
    val df = spark.range(5000).select((col("id") % 37).as("v"))
    val a = Cms.registers(df, col("v"))
      .orderBy("r", "c").as[(Int, Long, Long)].collect().toSeq
    val b = Cms.registers(df.repartition(17, col("v")), col("v"))
      .orderBy("r", "c").as[(Int, Long, Long)].collect().toSeq
    assert(a == b, "partial-agg order must not change any counter")
    assert(a.forall { case (r, c, cnt) =>
      r >= 0 && r < Cms.Depth && c >= 0 && c < Cms.Width && cnt >= 1 })
    // every row of the sketch accounts for every input row exactly once
    assert(a.groupBy(_._1).values.forall(_.map(_._3).sum == 5000L))
  }

  test("sum-merge of two sketches equals the sketch of the union") {
    import spark.implicits._
    val d1 = spark.range(0, 3000).select((col("id") % 91).as("v"))
    val d2 = spark.range(0, 4000).select((col("id") % 53).as("v"))
    val merged = Cms.registers(d1, col("v"))
      .unionAll(Cms.registers(d2, col("v")))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .orderBy("r", "c").as[(Int, Long, Long)].collect().toSeq
    val direct = Cms.registers(d1.unionAll(d2), col("v"))
      .orderBy("r", "c").as[(Int, Long, Long)].collect().toSeq
    assert(merged == direct,
      "sketch(A) + sketch(B) must equal sketch(A union B)")
  }

  test("estimates never underestimate; unseen probes read zero") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // skewed multiplicities so collisions matter
    val vals = (0 until 4000).map(_ => rnd.nextInt(rnd.nextInt(200) + 1))
    val df = vals.toDF("v")
    val regs = Cms.registers(df, col("v"))
    val exact = vals.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val probes = (exact.keys.toSeq ++ Seq(100000, 100001)).map(k =>
      (k.toString, k.toLong)).toDF("v", "k")
    val got = Cms.estimate(regs, probes)
      .select(col("k"), col("est")).as[(Long, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(got(k.toLong) >= n, s"CMS underestimated key $k: ${got(k.toLong)} < $n")
    }
    // the zero-restoration path needs a SPARSE sketch: with only 3 keys
    // set (12 of 2048 counters), an unseen probe's 4 counters cannot all
    // be hit, so the left-join + coalesce must surface an exact 0
    val sparse = Cms.registers(Seq(1, 2, 3).toDF("v"), col("v"))
    val sparseGot = Cms.estimate(sparse,
        Seq(("999983", 0L), ("999984", 1L)).toDF("v", "k"))
      .select(col("k"), col("est")).as[(Long, Long)].collect().toMap
    assert(sparseGot(0L) == 0L && sparseGot(1L) == 0L,
      s"unseen probes against a sparse sketch must read 0, got $sparseGot")
    // the error bound e*N/Width holds in expectation; assert a loose 8x
    val slack = 8L * math.ceil(math.E * vals.size / Cms.Width).toLong
    exact.foreach { case (k, n) =>
      assert(got(k.toLong) - n <= slack, s"key $k overcount ${got(k.toLong) - n}")
    }
  }

  test("probes may carry columns named like the sketch internals") {
    import spark.implicits._
    val regs = Cms.registers(Seq(5, 5, 6).toDF("v"), col("v"))
    // r / c / cnt are the register-table names — carried copies must
    // neither collide nor be clobbered
    val probes = Seq(("5", 10L, 20L, 30L)).toDF("v", "r", "c", "cnt")
    val row = Cms.estimate(regs, probes)
      .select(col("r"), col("c"), col("cnt"), col("est"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(row == ((10L, 20L, 30L, 2L)))
  }

  test("register build partial-aggregates map-side; probes broadcast the sketch") {
    import spark.implicits._
    val df = spark.range(1000).select((col("id") % 7).as("v"))
    val regPlan = Cms.registers(df, col("v")).queryExecution.executedPlan.toString
    assert(regPlan.contains("partial_count") || regPlan.contains("partial count"),
      s"register build must map-side combine before the shuffle:\n$regPlan")
    val probes = df.distinct().select(col("v").cast("string").as("v"), col("v").as("k"))
    val estPlan = Cms.estimate(Cms.registers(df, col("v")), probes)
      .queryExecution.executedPlan.toString
    assert(estPlan.contains("BroadcastHashJoin"),
      s"the Depth x Width sketch must broadcast to the probes:\n$estPlan")
  }
}
