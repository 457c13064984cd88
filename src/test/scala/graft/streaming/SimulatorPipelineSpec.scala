package graft.streaming

import graft.SparkSpec
import graft.sources.Simulator
import org.apache.spark.sql.functions._

/** End-to-end: the deterministic simulator feeds the entity rule engine —
  * the reference's simulator → processor → alerts path (SURVEY §3.1)
  * reproduced as generator Dataset → stateful pipeline.
  */
class SimulatorPipelineSpec extends SparkSpec {

  test("simulated SASE stream produces alerts through the rule engine") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val sim = Simulator.entityEvents(spark, 5000, rps = 100.0)
      .select(col("eventId"), col("ts"), col("entityId"), col("eventType"),
        col("value"), element_at(col("tags"), "status").as("status"))
      .as[(String, java.sql.Timestamp, String, String, Long, String)]
      .collect()
      .map { case (id, t, e, ty, v, st) =>
        EntityEvent(id, t, e, ty, Some(v), None, Some(st))
      }

    val input = MemoryStream[EntityEvent]
    // 100 ev/s over 50 entities -> per (entity, type) rates around a few
    // per minute; loose thresholds so rules actually fire
    val cfg = EntityPipeline.RuleConfig(
      r1Factor = 0.1, r1MinRate = 2.0, r2Factor = 2.0, r2MinCount = 1,
      r4FactorP95 = 0.0, r4MinThreshold = 50000.0)
    val query = EntityPipeline.alerts(spark, input.toDS(), cfg)
      .writeStream.format("memory").queryName("sim_alerts")
      .outputMode("append").start()
    try {
      sim.grouped(1000).foreach { b => input.addData(b); query.processAllAvailable() }
      val alerts = spark.table("sim_alerts").as[Alert].collect()
      val byRule = alerts.groupBy(_.rule).view.mapValues(_.length).toMap
      assert(byRule.getOrElse("R1_VELOCITY_SPIKE", 0) > 0)
      assert(byRule.getOrElse("R2_VALUE_SPIKE", 0) > 0)
      // deterministic: a second replay yields the identical alert multiset
      val input2 = MemoryStream[EntityEvent]
      val q2 = EntityPipeline.alerts(spark, input2.toDS(), cfg)
        .writeStream.format("memory").queryName("sim_alerts2")
        .outputMode("append").start()
      try {
        sim.grouped(1000).foreach { b => input2.addData(b); q2.processAllAvailable() }
        val a1 = alerts.map(a => (a.ts, a.rule, a.entityId, a.rateNow)).sortBy(_.toString)
        val a2 = spark.table("sim_alerts2").as[Alert].collect()
          .map(a => (a.ts, a.rule, a.entityId, a.rateNow)).sortBy(_.toString)
        assert(a1.toSeq == a2.toSeq)
      } finally q2.stop()
    } finally query.stop()
  }
}
