package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** CDP pipeline: reference-pinned semantics — power_user ENTER after 5
  * TRACKs, LWW equal-ts tie keeps later arrival, dedup per profile but
  * independent across profiles, EXIT when the 24h window rolls off.
  */
class CdpPipelineSpec extends SparkSpec {
  import CdpPipeline._

  private def track(id: String, t: String, user: String,
                    traits: Map[String, String] = Map.empty) =
    CdpEvent(id, ts(t), "TRACK", Some(user), None, None, Some("feature_used"), traits)

  private def identify(id: String, t: String, user: String,
                       traits: Map[String, String]) =
    CdpEvent(id, ts(t), "IDENTIFY", Some(user), None, None, None, traits)

  test("power_user ENTER emitted on the 5th TRACK within 24h") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CdpEvent]
    val query = segmentEvents(spark, input.toDS())
      .writeStream.format("memory").queryName("segs_pu")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1 to 5).map(i =>
        track(s"e$i", f"2024-01-01T00:0$i:00Z", "u1")): _*)
      query.processAllAvailable()
      val out = spark.table("segs_pu").as[SegmentEvent].collect()
      assert(out.count(e => e.segment == "power_user" && e.action == "ENTER") == 1)
      assert(out.head.profileId == "user:u1")
      assert(out.head.ts == ts("2024-01-01T00:05:00Z")) // the 5th track
    } finally query.stop()
  }

  test("LWW: equal-timestamp trait updates keep the later arrival") {
    import spark.implicits._
    val events = Seq(
      identify("e1", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "free")),
      // same ts, later event id -> must win (ProfileStoreTest.kt:120-134)
      identify("e2", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "pro")))
    val snap = profileSnapshots(spark, spark.createDataset(events)).collect()
    assert(snap.length == 1)
    assert(snap.head.traits("plan") == "pro")
    assert(snap.head.segments.contains("pro_plan"))
  }

  test("LWW equal-ts tie across MICRO-BATCHES matches batch replay (eventId order, not arrival)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // e2 (pro) arrives in batch 1, e1 (free) — same ts, SMALLER eventId —
    // in batch 2: the replay fixpoint orders by (ts, eventId), so pro must
    // survive e1's later arrival. Before the (ts, eventId)-total-order tie
    // rule, arrival order decided and the stream diverged from replay.
    val input = MemoryStream[CdpEvent]
    val query = profileUpdates(spark, input.toDS())
      .writeStream.format("memory").queryName("lww_xbatch")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(identify("e2", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "pro")))
      query.processAllAvailable()
      input.addData(identify("e1", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "free")))
      query.processAllAvailable()
      val rows = spark.table("lww_xbatch").as[ProfileSnapshot].collect()
      assert(rows.nonEmpty && rows.forall(_.traits("plan") == "pro"),
        s"equal-ts tie must resolve by eventId in the stream too: ${rows.toSeq}")
      // and the batch replay of the same log agrees
      val snap = profileSnapshots(spark, spark.createDataset(Seq(
        identify("e2", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "pro")),
        identify("e1", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "free"))))).collect()
      assert(snap.head.traits("plan") == "pro")
    } finally query.stop()
  }

  test("older trait update does not overwrite newer one") {
    import spark.implicits._
    val events = Seq(
      identify("e2", "2024-01-01T01:00:00Z", "u1", Map("plan" -> "pro")),
      identify("e1", "2024-01-01T00:00:00Z", "u1", Map("plan" -> "free")))
    val snap = profileSnapshots(spark, spark.createDataset(events)).collect()
    assert(snap.head.traits("plan") == "pro")
  }

  test("dedup drops repeated eventId within a profile, not across profiles") {
    import spark.implicits._
    val events = Seq(
      track("dup", "2024-01-01T00:00:00Z", "u1"),
      track("dup", "2024-01-01T00:01:00Z", "u1"), // dropped
      track("dup", "2024-01-01T00:00:00Z", "u2")) // different profile: kept
    val snaps = profileSnapshots(spark, spark.createDataset(events)).collect()
      .map(s => s.profileId -> s.trackCount24h).toMap
    assert(snaps("user:u1") == 1)
    assert(snaps("user:u2") == 1)
  }

  test("24h roll-off: EXIT power_user when old tracks age out") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CdpEvent]
    val query = segmentEvents(spark, input.toDS())
      .writeStream.format("memory").queryName("segs_exit")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1 to 5).map(i =>
        track(s"e$i", f"2024-01-01T00:0$i:00Z", "u1")): _*)
      query.processAllAvailable()
      input.addData(track("late", "2024-01-03T00:00:00Z", "u1"))
      query.processAllAvailable()
      val out = spark.table("segs_exit").as[SegmentEvent].collect()
      assert(out.exists(e => e.segment == "power_user" && e.action == "ENTER"))
      assert(out.exists(e => e.segment == "power_user" && e.action == "EXIT" &&
        e.ts == ts("2024-01-03T00:00:00Z")))
    } finally query.stop()
  }

  test("identifier merge is grow-only; emails normalized lowercase") {
    import spark.implicits._
    val events = Seq(
      CdpEvent("e1", ts("2024-01-01T00:00:00Z"), "IDENTIFY", Some("u1"), Some("a1"),
        Some("Bob@Example.COM"), None, Map.empty),
      CdpEvent("e2", ts("2024-01-01T00:01:00Z"), "IDENTIFY", Some("u1"), Some("a2"),
        Some("bob@example.com"), None, Map.empty))
    val snap = profileSnapshots(spark, spark.createDataset(events)).collect().head
    assert(snap.anonymousIds == Seq("a1", "a2"))
    assert(snap.emails == Seq("bob@example.com"))
  }

  test("profileUpdates emits only on change; duplicate batch emits nothing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdpEvent]
    val query = profileUpdates(spark, input.toDS())
      .writeStream.format("memory").queryName("prof_updates")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      input.addData(CdpEvent("e1", ts("2024-01-01T00:00:00Z"), "IDENTIFY",
        Some("u1"), None, None, None, Map("plan" -> "pro")))
      query.processAllAvailable()
      val snaps1 = spark.table("prof_updates").as[ProfileSnapshot].collect()
      assert(snaps1.length == 1 && snaps1.head.traits("plan") == "pro")
      // the SAME event again: dedup makes the fold a no-op — the
      // changed-only contract (W7) must emit no second snapshot
      input.addData(CdpEvent("e1", ts("2024-01-01T00:00:00Z"), "IDENTIFY",
        Some("u1"), None, None, None, Map("plan" -> "pro")))
      query.processAllAvailable()
      assert(spark.table("prof_updates").count() == 1)
      // a genuinely new event emits exactly one more
      input.addData(CdpEvent("e2", ts("2024-01-01T00:05:00Z"), "TRACK",
        Some("u1"), None, None, Some("feature_used"), Map.empty))
      query.processAllAvailable()
      val snaps2 = spark.table("prof_updates").as[ProfileSnapshot].collect()
      assert(snaps2.length == 2 && snaps2.map(_.trackCount24h).max == 1L)
    } finally query.stop()
  }
}
