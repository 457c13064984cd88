package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Checkpoint recovery: a stateful query stopped and restarted from its
  * checkpoint must resume with its per-key state intact — an R1 alert
  * whose rate counts events from BEFORE the restart proves the window
  * state survived, which is the property the reference's in-memory store
  * loses on every restart (`docs/cdp/README.md:634-636`).
  */
object CheckpointRecoverySpec {
  // foreachBatch sink target (the memory sink cannot recover from a
  // checkpoint); static so executors/driver share one buffer in local mode
  val alerts = new java.util.concurrent.ConcurrentLinkedQueue[Alert]()
}

class CheckpointRecoverySpec extends SparkSpec {

  private def writeEvents(dir: String, name: String, lines: Seq[String]): Unit =
    Files.writeString(Path.of(dir, name), lines.mkString("", "\n", "\n"))

  private def ev(id: String, t: String, v: Long) =
    s"""{"eventId":"$id","ts":"$t","entityId":"a","eventType":"t","value":$v}"""

  test("entity window state survives a query restart from checkpoint") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("ckpt_in").toString
    val ckpt = Files.createTempDirectory("ckpt_state").toString

    def startQuery() = {
      val events = spark.readStream
        .schema("eventId STRING, ts TIMESTAMP, entityId STRING, eventType STRING, value LONG")
        .json(inDir)
        .withColumn("geo", lit(null: String))
        .withColumn("device", lit(null: String))
        .as[EntityEvent]
      val cfg = EntityPipeline.RuleConfig(
        r1Factor = 0.001, r1MinRate = 3.0, r2Factor = 1e18, r4MinThreshold = 1e18)
      EntityPipeline.alerts(spark, events, cfg)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Alert], _: Long) =>
          batch.collect().foreach(CheckpointRecoverySpec.alerts.add)
        }
        .start()
    }

    // phase 1: two events — below the rate threshold, no alert
    writeEvents(inDir, "b1.json", Seq(
      ev("e1", "2024-01-01T00:00:00Z", 1),
      ev("e2", "2024-01-01T00:00:20Z", 1)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(CheckpointRecoverySpec.alerts.isEmpty)

    // phase 2: NEW query, same checkpoint; the third event's 60s rate must
    // count the two pre-restart events (3 >= minRate) — only possible if
    // the flatMapGroupsWithState state was restored
    writeEvents(inDir, "b2.json", Seq(ev("e3", "2024-01-01T00:00:40Z", 1)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = CheckpointRecoverySpec.alerts.asScala.toSeq
        .filter(_.rule == "R1_VELOCITY_SPIKE")
      assert(got.length == 1)
      assert(got.head.rateNow == 3.0)
    } finally q2.stop()
  }
}
