package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The batch reengage replay (q_reengage_segments) and the streaming
  * ReengageProcessor implement ONE timer contract — hold them equal on a
  * fixture log exercising all three rules: idle ENTER + return EXIT, a
  * cleanup-horizon crossing that loses its EXIT, and a final idle gap at
  * log end that ENTERs with no EXIT. Events feed the stream one per
  * micro-batch in ts order so per-event replay semantics apply, and a
  * trailing clock event pushes the watermark past every horizon (the
  * replay's log-end clock; fixture gaps sit well clear of the 1-minute
  * watermark delay so the two clocks agree on every comparison).
  */
class ReengageReplaySpec extends SparkSpec {

  private def ev(id: String, at: String, user: String) =
    CdpEvent(id, ts(at), "TRACK", Some(user), None, None, Some("f"), Map.empty)

  test("batch replay == streaming processor on a three-rule fixture log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idleMs = 600000L // 10 m; cleanup horizon = 100 m
    val fixture = Seq(
      // u1: 30 m gap -> ENTER at 00:00+10m, EXIT at 00:30; then active
      ev("a1", "2024-01-01T00:00:00Z", "u1"),
      ev("a2", "2024-01-01T00:30:00Z", "u1"),
      ev("a3", "2024-01-01T00:35:00Z", "u1"), // 5 m gap: nothing
      // u2: 3 h gap crosses the 100 m cleanup horizon -> ENTER, EXIT lost
      ev("b1", "2024-01-01T00:05:00Z", "u2"),
      ev("b2", "2024-01-01T03:05:00Z", "u2"),
      // u3: single event, idle to log end -> final ENTER, no EXIT
      ev("c1", "2024-01-01T00:10:00Z", "u3"),
      // dense clock ticks keep the watermark moving between fixture
      // events (the processor's timers only fire as the watermark
      // advances) and the last one is the log-end clock
      ) ++ (1 to 50).map(i =>
        ev(s"w$i", f"2024-01-01T${i / 12}%02d:${(i % 12) * 5}%02d:01Z", "clock"))

    val sorted = fixture.sortBy(e => (e.ts.getTime, e.eventId))

    val input = MemoryStream[CdpEvent]
    val withWm = input.toDS().withWatermark("ts", "1 minute").as[CdpEvent]
    val query = CdpPipeline.reengageEvents(spark, withWm, idleMs)
      .writeStream.format("memory").queryName("reeng_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      sorted.foreach { e => input.addData(e); query.processAllAvailable() }
    } finally query.stop()
    val streamed = spark.table("reeng_replay").as[SegmentEvent].collect()
      .filterNot(_.profileId == "user:clock")
      .map(s => (s.profileId, s.action, s.ts.getTime * 1000)).toSet

    val batch = graft.queries.CdpBatch.reengageReplay(
      sorted.toDF()
        .select(col("userId").as("uid"), col("ts"))
        .select(concat(lit("user:"), col("uid")).as("pid"),
          unix_micros(col("ts")).as("ts_us")),
      idleMs)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filterNot(_._1 == "user:clock").toSet

    assert(batch == streamed,
      s"batch=${batch.toSeq.sorted}\nstreamed=${streamed.toSeq.sorted}")
    // the fixture exercises all three rules: 5 ENTERs (u1's 30 m gap, u1
    // final, u2's 3 h gap, u2 final, u3 final), exactly ONE EXIT (u1's
    // return — u2's return crossed the cleanup horizon and lost its EXIT)
    assert(batch.count(_._2 == "ENTER") == 5, batch)
    assert(batch.count(_._2 == "EXIT") == 1, batch)
    assert(!batch.exists(t => t._1 == "user:u2" && t._2 == "EXIT"), batch)
  }
}
