package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Timer-driven reengage segment: ENTER fires with no new events for the
  * profile (watermark passes lastSeen + idle); the next activity EXITs.
  */
class ReengageSpec extends SparkSpec {

  private def ev(id: String, at: String, user: String) =
    CdpEvent(id, ts(at), "TRACK", Some(user), None, None, Some("f"), Map.empty)

  test("idle profile ENTERs reengage via event-time timer; activity EXITs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[CdpEvent]
    val withWm = input.toDS().withWatermark("ts", "1 minute").as[CdpEvent]
    val query = CdpPipeline.reengageEvents(spark, withWm, idleMs = 600000L) // 10 m
      .writeStream.format("memory").queryName("reeng")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(ev("e1", "2024-01-01T00:00:00Z", "u1"))
      query.processAllAvailable()
      assert(spark.table("reeng").count() == 0)
      // another profile's events push the watermark past u1's idle horizon
      input.addData(ev("e2", "2024-01-01T00:30:00Z", "u2"))
      query.processAllAvailable()
      input.addData(ev("e3", "2024-01-01T00:31:00Z", "u2")) // wm: 00:30
      query.processAllAvailable()
      val afterIdle = spark.table("reeng").as[SegmentEvent].collect()
      assert(afterIdle.exists(s =>
        s.profileId == "user:u1" && s.action == "ENTER" &&
          s.ts == ts("2024-01-01T00:10:00Z")), afterIdle.mkString(","))
      // u1 comes back -> EXIT stamped with the returning event's time
      input.addData(ev("e4", "2024-01-01T00:40:00Z", "u1"))
      query.processAllAvailable()
      val all = spark.table("reeng").as[SegmentEvent].collect()
      assert(all.exists(s => s.profileId == "user:u1" && s.action == "EXIT" &&
        s.ts == ts("2024-01-01T00:40:00Z")), all.mkString(","))
    } finally query.stop()
  }
}
