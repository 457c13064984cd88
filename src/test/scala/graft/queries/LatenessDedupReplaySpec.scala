package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Watermarks

/** The composed W1 x W2 contract (q_lateness_dedup_replay): the batch
  * restatement's accepted set must equal the REAL streaming operator's
  * survivor set — `Watermarks.dedup` (withWatermark +
  * dropDuplicatesWithinWatermark) driven batch-by-batch over a fixture
  * whose arrivals are controlled so the replay's clock (each
  * occurrence's own arrival) equals the watermark base the streaming
  * operator evaluates that batch against (max prior event time). Covers
  * all four interaction cases: in-horizon duplicate (dedup hit),
  * past-horizon duplicate (watermark drop, not a dedup decision),
  * watermark-dropped original (no state created; its duplicate is
  * judged on its own), and a late-but-accepted original still creating
  * dedup state.
  */
class LatenessDedupReplaySpec extends SparkSpec {

  private val U = 77L
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // (event_id, arrival_sec, event_sec, occ) in feed order, batched so the
  // watermark base of each batch equals the tested rows' arrival
  private val batches: Seq[Seq[(Long, Long, Long, Int)]] = Seq(
    Seq((1L, 1000L, 1000L, 1), (2L, 1000L, 1000L, 1), (5L, 1000L, 1000L, 1)),
    Seq((1L, 1050L, 1000L, 2), (3L, 1100L, 1100L, 1)), // in-horizon dup of 1
    Seq((4L, 1300L, 1300L, 1)),                        // clock driver
    Seq((5L, 1300L, 1000L, 2), (6L, 1300L, 900L, 1)),  // expired dup; stale original
    Seq((6L, 1310L, 900L, 2), (7L, 1302L, 1295L, 1)),  // dup of dropped; late original
    Seq((7L, 1304L, 1295L, 2)))                        // dup of late-but-accepted

  test("replay accepted set == streaming dedup survivor set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp)]
    val q = Watermarks.dedup(
        in.toDF().toDF("event_id", "user_id", "ts"),
        "ts", graceSec = 120, "user_id", "event_id")
      .writeStream.queryName("lateness_dedup_replay_fixture")
      .outputMode(OutputMode.Append()).format("memory").start()
    try {
      batches.foreach { b =>
        in.addData(b.map { case (id, _, sec, _) => (id, U, ts(sec)) })
        q.processAllAvailable()
      }
      val survivors = spark.table("lateness_dedup_replay_fixture")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq

      val occ = batches.flatten
        .map { case (id, arr, sec, o) => (id, U, sec * 1000000L, arr * 1000000L, o) }
        .toDF("event_id", "user_id", "ts_us", "arr_us", "occ")
      val replay = CdpReplay.dedupLatenessClasses(occ)
        .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getString(3)).toMap
      val accepted = replay.collect {
        case ((id, _), c) if c == "normal" || c == "late" => id
      }.toSeq.sorted
      assert(survivors == accepted,
        s"streaming=$survivors replay-accepted=$accepted classes=$replay")

      // the replay's richer classification is pinned exactly
      assert(replay == Map(
        (1L, 1) -> "normal", (2L, 1) -> "normal", (5L, 1) -> "normal",
        (1L, 2) -> "duplicate", // in horizon, first accepted
        (3L, 1) -> "normal", (4L, 1) -> "normal",
        (5L, 2) -> "dropped",   // past the grace horizon: watermark drop
        (6L, 1) -> "dropped",   // stale original
        (6L, 2) -> "dropped",   // duplicate of a dropped original: own tier
        (7L, 1) -> "late",      // accepted late -> still creates state
        (7L, 2) -> "duplicate"))
    } finally q.stop()
  }
}
