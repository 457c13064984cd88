package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized differential for the W2 two-tier lateness rule: the
  * distributed replay (running-max clock per profile + Watermarks.lateClass)
  * against a tiny imperative oracle that walks each profile's queue in
  * arrival order carrying a monotone clock — the reference's
  * CdpEventProcessor shape (strict isBefore on both cutoffs). Random
  * arrival delays include negative ones (event time ahead of the clock)
  * and exact-boundary values (delay == softLag, delay == grace), where a
  * <= / < confusion would flip the class.
  */
class LatenessSpec extends SparkSpec {

  private val SoftLagSec = 5
  private val GraceSec = 120

  test("distributed lateness replay == imperative per-profile oracle") {
    import spark.implicits._
    for (seed <- 0 until 8) {
      val rnd = new Random(4000 + seed)
      // (eventId, userId, tsUs, arrivalDelaySec) — delays hit both exact
      // boundaries and negatives
      val boundary = Seq(-3, 0, SoftLagSec, SoftLagSec + 1, GraceSec, GraceSec + 1)
      val events = (0 until 120).map { i =>
        val delay =
          if (rnd.nextBoolean()) boundary(rnd.nextInt(boundary.size))
          else rnd.nextInt(200) - 20
        (i.toLong, (i % 7).toLong,
          1704067200000000L + rnd.nextInt(600) * 1000000L, delay)
      }
      // oracle: per profile in event_id (arrival) order, a monotone clock
      val want = events.groupBy(_._2).flatMap { case (_, evs) =>
        var clock = Long.MinValue
        evs.sortBy(_._1).map { case (id, _, tsUs, d) =>
          val arr = tsUs + d * 1000000L
          clock = math.max(clock, arr)
          val cls =
            if (tsUs < clock - GraceSec * 1000000L) "dropped"
            else if (tsUs < clock - SoftLagSec * 1000000L) "late"
            else "normal"
          id -> cls
        }
      }.toMap

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val got = events.toDF("event_id", "user_id", "ts_us", "delay_s")
        .withColumn("arr_us", col("ts_us") + col("delay_s") * 1000000L)
        .withColumn("clock_us", max(col("arr_us")).over(w))
        .select(col("event_id"),
          Watermarks.lateClass(
            timestamp_micros(col("ts_us")), timestamp_micros(col("clock_us")),
            SoftLagSec, GraceSec).as("class"))
        .as[(Long, String)].collect().toMap
      assert(got == want, s"seed=$seed diff=${
        (got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
    }
  }
}
