package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Native session_window streaming sessionization: sessions extend while
  * events arrive within the gap, merge across micro-batches, and emit
  * exactly once when the watermark passes session end.
  */
class SessionizationSpec extends SparkSpec {

  test("sessions merge within gap, split across it, emit when watermark passes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val query = Sessionization
      .sessions(input.toDF().toDF("user_id", "ts"), gap = "30 minutes",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // session A1: three events within the gap, split across two batches
      input.addData(("u1", ts("2024-01-01T00:00:00Z")), ("u1", ts("2024-01-01T00:10:00Z")))
      query.processAllAvailable()
      input.addData(("u1", ts("2024-01-01T00:25:00Z"))) // still within 30 m of prev
      query.processAllAvailable()
      // a second user in parallel
      input.addData(("u2", ts("2024-01-01T00:05:00Z")))
      query.processAllAvailable()
      // nothing closed yet: watermark trails max ts by 10 m
      assert(spark.table("sess").count() == 0)
      // gap-crossing event starts session A2 AND pushes the watermark past
      // A1's close (00:25 + 30 m gap = 00:55; wm = 02:00 - 10 m = 01:50)
      input.addData(("u1", ts("2024-01-01T02:00:00Z")))
      query.processAllAvailable()
      input.addData(("u1", ts("2024-01-01T04:00:00Z"))) // close A2 + u2's session
      query.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(3))).toSet
      assert(rows.contains(("u1", ts("2024-01-01T00:00:00Z"), 3L))) // A1: merged 3 events
      assert(rows.contains(("u1", ts("2024-01-01T02:00:00Z"), 1L))) // A2
      assert(rows.contains(("u2", ts("2024-01-01T00:05:00Z"), 1L)))
      // session end = last event + gap
      val a1 = spark.table("sess").collect()
        .find(r => r.getString(0) == "u1" && r.getTimestamp(1) == ts("2024-01-01T00:00:00Z")).get
      assert(a1.getTimestamp(2) == ts("2024-01-01T00:55:00Z"))
    } finally query.stop()
  }

  test("batch parity: session_window counts match the lag+running-sum shape") {
    import spark.implicits._
    val events = Seq(
      ("u1", ts("2024-01-01T00:00:00Z")), ("u1", ts("2024-01-01T00:20:00Z")),
      ("u1", ts("2024-01-01T01:30:00Z")),
      ("u2", ts("2024-01-01T00:00:00Z"))).toDF("user_id", "ts")
    val viaSessionWindow = Sessionization.sessions(events, "30 minutes", "0 seconds")
      .select("user_id", "n_events").as[(String, Long)].collect().sorted.toSeq
    assert(viaSessionWindow == Seq(("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }
}
