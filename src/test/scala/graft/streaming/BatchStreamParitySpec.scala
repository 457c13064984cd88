package graft.streaming

import graft.SparkSpec
import graft.operators.Rules
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream parity: replaying the event log through the streaming
  * pipeline must produce exactly the batch operators' results — the
  * property that makes the DuckDB-oracled batch surface meaningful for
  * the streaming engine. (CDP parity holds by construction — both paths
  * share `applyEvent` — so the interesting check is the entity pipeline,
  * whose batch and streaming implementations are independent.)
  */
class BatchStreamParitySpec extends SparkSpec {

  test("streaming R1 alerts == batch velocitySpike on the same event log") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    // batch side: R1 with scaled thresholds (events table is sparse)
    val events = graft.Tables.events(spark, dir)
    val batchAlerts = Rules.velocitySpike(events, factor = 0.01, minRate = 1.0)
      .select(col("event_id"), col("rate_now")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // streaming side: same thresholds, events split across 3 micro-batches
    val typed = events
      .select(col("event_id").cast("string").as("eventId"), col("ts"),
        col("user_id").cast("string").as("entityId"),
        col("event_type").as("eventType"),
        col("value").cast("long").as("valueL"))
      .as[(String, java.sql.Timestamp, String, String, Long)]
      .collect()
      .map { case (id, t, e, ty, v) => EntityEvent(id, t, e, ty, Some(v), None, None) }
      .sortBy(e => (e.ts.getTime, e.eventId))

    val input = MemoryStream[EntityEvent]
    val cfg = EntityPipeline.RuleConfig(
      horizonMs = 300000L, r1Factor = 0.01, r1MinRate = 1.0, r2Factor = 1e18)
    val query = EntityPipeline.alerts(spark, input.toDS(), cfg)
      .writeStream.format("memory").queryName("parity_alerts")
      .outputMode(OutputMode.Append()).start()
    try {
      typed.grouped(math.max(1, typed.length / 3)).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
      val streamAlerts = spark.table("parity_alerts").as[Alert].collect()
        .filter(_.rule == "R1_VELOCITY_SPIKE")
      // batch rounds rate_now to 4 decimals; rates are integral counts
      val streamIds = streamAlerts.map(_.rateNow).length
      assert(streamAlerts.nonEmpty && batchAlerts.nonEmpty)
      assert(streamIds == batchAlerts.size,
        s"stream ${streamIds} != batch ${batchAlerts.size}")
      // value parity on the alert keys: rate_now must agree
      val streamRates = streamAlerts.map(a => a.rateNow).sorted
      val batchRates = batchAlerts.values.toSeq.sorted
      assert(streamRates.zip(batchRates).forall { case (a, b) => a == b })
    } finally query.stop()
  }
}
