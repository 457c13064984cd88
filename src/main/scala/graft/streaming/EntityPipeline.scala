package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming entity-analytics pipeline (SURVEY §3.1): per-(entityId, type)
  * stateful sliding windows + EWMA + rule predicates, emitting alerts.
  *
  * Re-expresses the reference's WindowStore + Rules loop
  * (`core/WindowStore.kt:37-147`, `core/Rules.kt:37-93`,
  * `ingest/Processor.kt:79-129`) as one `flatMapGroupsWithState` operator:
  * state = bounded deque of (ts, value) within the 5-minute horizon plus
  * the EWMA register; every event appends, prunes, computes the window
  * aggregates anchored at its own event time (inclusive bounds), updates
  * EWMA with the current value BEFORE comparing (the reference's R2
  * ordering, `core/Rules.kt:70-74`), and emits alerts.
  *
  * Scale: state is per-key and bounded by the horizon; keys partition
  * across executors (one shuffle); events within a micro-batch are applied
  * in (ts, eventId) order per key, so replay is deterministic.
  */
object EntityPipeline {

  case class WindowState(points: List[(Long, Double)], ewma: Option[Double])

  case class RuleConfig(
      horizonMs: Long = 300000L,
      r1Factor: Double = 3.0,
      r1MinRate: Double = 20.0,
      r2Alpha: Double = 0.1,
      r2Factor: Double = 4.0,
      r2MinCount: Long = 5)

  def severity(value: Double, threshold: Double): String =
    if (threshold <= 0) "HIGH"
    else if (value / threshold >= 10.0) "HIGH"
    else if (value / threshold >= 5.0) "MEDIUM"
    else "LOW"

  def alerts(spark: SparkSession, events: Dataset[EntityEvent],
             cfg: RuleConfig = RuleConfig()): Dataset[Alert] = {
    import spark.implicits._
    events
      .groupByKey(e => (e.entityId, e.eventType))
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(processGroup(cfg))
  }

  private def processGroup(cfg: RuleConfig)(
      key: (String, String), rows: Iterator[EntityEvent],
      state: GroupState[WindowState]): Iterator[Alert] = {
    val (entityId, _) = key
    var st = state.getOption.getOrElse(WindowState(Nil, None))
    val out = Seq.newBuilder[Alert]
    // deterministic replay: apply in (ts, eventId) order within the batch
    val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
    ordered.foreach { e =>
      val t = e.ts.getTime
      val v = e.value.map(_.toDouble).getOrElse(1.0) // Processor.kt:134-139
      val pts = ((t, v) :: st.points).filter(_._1 >= t - cfg.horizonMs)
      // inclusive-bound window aggregates anchored at the event ts
      def cnt(ms: Long) = pts.count(p => p._1 >= t - ms).toDouble
      def sum(ms: Long) = pts.filter(p => p._1 >= t - ms).map(_._2).sum
      val rateNow = cnt(60000L)
      val cnt5m = cnt(300000L)
      val avg5m = if (cnt5m == 0) 0.0 else sum(300000L) / cnt5m
      // R2 updates EWMA with the current value before comparing
      val ewma = st.ewma match {
        case None => v
        case Some(p) => cfg.r2Alpha * v + (1 - cfg.r2Alpha) * p
      }
      st = WindowState(pts, Some(ewma))
      val thr1 = avg5m * cfg.r1Factor
      if (rateNow > thr1 && rateNow >= cfg.r1MinRate)
        out += Alert(e.ts, "R1_VELOCITY_SPIKE", entityId,
          severity(rateNow, thr1), rateNow, thr1)
      val thr2 = ewma * cfg.r2Factor
      if (v > thr2 && rateNow >= cfg.r2MinCount)
        out += Alert(e.ts, "R2_VALUE_SPIKE", entityId,
          severity(v, thr2), v, thr2)
    }
    state.update(st)
    out.result().iterator
  }
}
