package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketized interval join must produce exactly the rows of the
  * nested-loop `p BETWEEN lo AND hi` join it replaces — including
  * multiplicity for overlapping intervals — and must tolerate hostile
  * column names and internal-name collisions.
  */
class RangeJoinSpec extends SparkSpec {

  test("randomized parity with the nested-loop between-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val points = (0 until 300).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("k", "p", "pid")
    val intervals = (0 until 80).map { i =>
      val lo = rnd.nextInt(900).toLong
      (rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(200).toLong, i.toLong)
    }.toDF("k", "lo", "hi", "iid")
    val want = points.as("a").join(intervals.as("b"),
        col("a.k") === col("b.k") &&
          col("a.p") >= col("b.lo") && col("a.p") <= col("b.hi"))
      .select(col("pid"), col("iid"))
      .as[(Long, Long)].collect().sorted.toSeq
    Seq(7L, 64L, 5000L).foreach { w => // smaller, similar, larger than spans
      val got = RangeJoin.intervalJoin(points, intervals, "k", "p", "lo", "hi", w)
        .select(col("pid"), col("iid"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"bucketW=$w deviates")
    }
  }

  test("keyword / spaced column names and __bucket collisions survive") {
    import spark.implicits._
    // `from` is a SQL keyword, `p val` has a space, and both sides already
    // carry a __bucket0 column that must come through untouched
    val points = Seq((1L, 10L, 7L), (1L, 99L, 8L))
      .toDF("k", "p val", "__bucket0")
    val intervals = Seq((1L, 5L, 20L, 3L)).toDF("k", "from", "hi", "iid")
    val out = RangeJoin.intervalJoin(points, intervals, "k", "p val", "from", "hi", 8L)
    assert(out.columns.contains("__bucket0"), "caller's __bucket0 clobbered")
    val rows = out.select(col("`p val`"), col("__bucket0"), col("iid"))
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((10L, 7L, 3L)))
  }

  test("plans as a shuffle equijoin, not a nested loop") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong % 5, i.toLong, i.toLong))
      .toDF("k", "p", "pid")
    val intervals = (0 until 50).map(i => (i.toLong % 5, i.toLong, i + 10L, i.toLong))
      .toDF("k", "lo", "hi", "iid")
    val plan = RangeJoin.intervalJoin(points, intervals, "k", "p", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join fell back to a product plan:\n$plan")
  }
}
