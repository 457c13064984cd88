package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The built-in streaming path for A1–A4-style aggregates: event-time
  * tumbling windows + watermark in append mode — windows emit once final,
  * and data older than the watermark is dropped.
  */
class WindowedAggSpec extends SparkSpec {

  test("watermarked tumbling window: finalized windows emit; late data beyond watermark is dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("key", "ts", "v")
      .withWatermark("ts", "1 minute")
      .groupBy(col("key"), window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum"))
      .select(col("key"), unix_timestamp(col("window.start")).as("w_start"),
        col("cnt"), col("sum"))
    val query = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      input.addData(
        ("a", ts("2024-01-01T00:00:10Z"), 1L),
        ("a", ts("2024-01-01T00:00:40Z"), 2L))
      query.processAllAvailable()
      // advance the watermark far past the first window
      input.addData(("a", ts("2024-01-01T00:10:00Z"), 5L))
      query.processAllAvailable()
      // this event is older than watermark (00:09:00) -> dropped
      input.addData(("a", ts("2024-01-01T00:00:50Z"), 100L))
      query.processAllAvailable()
      input.addData(("a", ts("2024-01-01T00:20:00Z"), 7L)) // finalize 00:10
      query.processAllAvailable()
      val rows = spark.table("win_agg").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // first window: cnt 2 sum 3 (late v=100 NOT included); 00:10 window: 1/5
      assert(rows.contains((ts("2024-01-01T00:00:00Z").getTime / 1000, 2L, 3L)))
      assert(rows.contains((ts("2024-01-01T00:10:00Z").getTime / 1000, 1L, 5L)))
    } finally query.stop()
  }

  test("streaming windowed P95 sketch (A8): percentile_approx in append mode") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("key", "ts", "v")
      .withWatermark("ts", "1 minute")
      .groupBy(col("key"), window(col("ts"), "1 minute"))
      .agg(percentile_approx(col("v"), lit(0.95), lit(10000)).as("p95"),
        max(col("v")).as("mx"))
      .select(col("key"), col("p95"), col("mx"))
    val query = agg.writeStream.format("memory").queryName("win_p95")
      .outputMode("append").start()
    try {
      input.addData((1L to 100L).map(i => ("a", ts("2024-01-01T00:00:30Z"), i)): _*)
      query.processAllAvailable()
      input.addData(("a", ts("2024-01-01T00:10:00Z"), 1L)) // finalize window
      query.processAllAvailable()
      val r = spark.table("win_p95").collect().head
      assert(r.getLong(1) == 95L, s"p95 of 1..100 should be 95, got ${r.getLong(1)}")
      assert(r.getLong(2) == 100L)
    } finally query.stop()
  }
}
