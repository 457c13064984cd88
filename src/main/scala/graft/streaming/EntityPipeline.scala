package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming entity-analytics pipeline (SURVEY §3.1): per-(entityId, type)
  * stateful sliding windows + EWMA + rule predicates, emitting alerts.
  *
  * Re-expresses the reference's WindowStore + Rules loop
  * (`core/WindowStore.kt:37-147`, `core/Rules.kt:37-93`,
  * `ingest/Processor.kt:79-129`) as one `transformWithState` operator
  * (`EntityAlertProcessor`): state = bounded deque of (ts, value) within
  * the horizon (a typed ListState) plus the EWMA register (a ValueState);
  * every event appends, prunes, computes the window aggregates anchored at
  * its own event time (inclusive bounds), updates EWMA with the current
  * value BEFORE comparing (the reference's R2 ordering,
  * `core/Rules.kt:70-74`), and emits alerts.
  *
  * Scale: state is per-key and bounded by the horizon; keys partition
  * across executors (one shuffle); events within a micro-batch are applied
  * in (ts, eventId) order per key, so replay is deterministic.
  */
object EntityPipeline {

  /** points carry (ts, value, geo, device) so R3 can scan the trailing
    * conflict window without separate state.
    */
  case class WindowState(
      points: List[(Long, Double, Option[String], Option[String])],
      ewma: Option[Double])

  case class RuleConfig(
      horizonMs: Long = 3600000L, // 1 h: R4's avg window dominates
      r1Factor: Double = 3.0,
      r1MinRate: Double = 20.0,
      r2Alpha: Double = 0.1,
      r2Factor: Double = 4.0,
      r2MinCount: Long = 5,
      r3WindowMs: Long = 120000L,
      r4FactorP95: Double = 10.0,
      r4MinThreshold: Double = 1000.0)

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
      .transformWithState(new EntityAlertProcessor(cfg),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Pure fold of one ordered micro-batch: (state, events) → (state,
    * alerts). Shared core between the streaming processor and any replay;
    * caller must feed events in (ts, eventId) order.
    */
  private[streaming] def foldEvents(
      entityId: String, st0: WindowState, ordered: Seq[EntityEvent],
      cfg: RuleConfig): (WindowState, Seq[Alert]) = {
    var st = st0
    val out = Seq.newBuilder[Alert]
    ordered.foreach { e =>
      val t = e.ts.getTime
      val v = e.value.map(_.toDouble).getOrElse(1.0) // Processor.kt:134-139
      val pts = ((t, v, e.geo, e.device) :: st.points)
        .filter(_._1 >= t - cfg.horizonMs)
      // inclusive-bound window aggregates anchored at the event ts; the
      // upper bound matters for late events whose state already holds
      // points with LATER timestamps (batch RANGE frames exclude them too)
      def cnt(ms: Long) = pts.count(p => p._1 >= t - ms && p._1 <= t).toDouble
      def sum(ms: Long) = pts.filter(p => p._1 >= t - ms && p._1 <= t).map(_._2).sum
      val rateNow = cnt(60000L)
      val cnt5m = cnt(300000L)
      val avg5m = if (cnt5m == 0) 0.0 else sum(300000L) / cnt5m
      val cnt1h = cnt(cfg.horizonMs)
      val avg1h = if (cnt1h == 0) 0.0 else sum(cfg.horizonMs) / cnt1h
      val sum30s = sum(30000L)
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
      // R3: conflicting geo/device tags in the trailing window — the real
      // implementation of the reference's stubbed spec (Rules.kt:98-154)
      val recent = pts.filter(p => p._1 >= t - cfg.r3WindowMs && p._1 <= t)
      val geos = recent.flatMap(_._3).distinct
      val devs = recent.flatMap(_._4).distinct
      if (geos.length > 1 || devs.length > 1)
        out += Alert(e.ts, "R3_TAG_MISMATCH", entityId, "MEDIUM",
          math.max(geos.length, devs.length).toDouble, 1.0)
      // R4: exfil — sum(30 s) above the P95 fallback
      // max(floor(factor * avg1h), min) (Rules.kt:159-200)
      val thr4 = math.max(math.floor(avg1h * cfg.r4FactorP95), cfg.r4MinThreshold)
      if (sum30s > thr4)
        out += Alert(e.ts, "R4_EXFIL", entityId, "HIGH", sum30s, thr4)
    }
    (st, out.result())
  }
}

/** transformWithState processor for `EntityPipeline.alerts`. The window
  * deque lives in a typed `ListState` and the EWMA register in a
  * `ValueState` — read once per micro-batch, folded in memory, written
  * back once. When no point aged out of the horizon, only the NEW points
  * are appended (an append-only RocksDB changelog write); a prune rewrites
  * the list. Point order in state is irrelevant: every window aggregate is
  * a filter over (ts ≤ anchor) — order sensitivity lives in the per-batch
  * event sort, not the deque.
  *
  * DEAD-KEY TRADEOFF (deliberate): an entity that stops sending pins its
  * last window (≤ horizon of points) + EWMA register forever — total
  * state is O(distinct keys ever seen), not O(live keys). Both eviction
  * mechanisms were considered and rejected: processing-time `TTLConfig`
  * forces `TimeMode.ProcessingTime`, whose never-quiescing empty batches
  * and wall-clock nondeterminism the CdpProcessors doc details; and
  * event-time cleanup timers (ReengageProcessor's pattern) require a
  * watermark on THIS stream, which would make Spark drop exactly the
  * late events the two-tier lateness machinery exists to classify. Under
  * ephemeral-key workloads (session ids, NATed IPs) bound the key space
  * upstream — pre-filter to entities worth tracking — rather than here.
  * RollingCounterProcessor shares this contract.
  */
class EntityAlertProcessor(cfg: EntityPipeline.RuleConfig)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    (String, String), EntityEvent, Alert] {

  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, TimerValues, ValueState}

  type Point = (Long, Double, Option[String], Option[String])

  @transient private var points: ListState[Point] = _
  @transient private var ewma: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    points = getHandle.getListState[Point]("points",
      Encoders.product[Point], TTLConfig.NONE)
    ewma = getHandle.getValueState[Double]("ewma",
      Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: (String, String), rows: Iterator[EntityEvent],
      timerValues: TimerValues): Iterator[Alert] = {
    val pts0 = points.get().toList
    val st0 = EntityPipeline.WindowState(pts0,
      if (ewma.exists()) Some(ewma.get()) else None)
    // deterministic replay: apply in (ts, eventId) order within the batch
    val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
    val (st, alerts) = EntityPipeline.foldEvents(key._1, st0, ordered, cfg)
    // each event prepends exactly one point; pruning only removes — so a
    // size match means nothing aged out and the new points are the first
    // `ordered.size` entries: append-only changelog write. Otherwise the
    // horizon moved and the list is rewritten.
    if (st.points.size == pts0.size + ordered.size)
      points.appendList(st.points.take(ordered.size).toArray)
    else
      points.put(st.points.toArray)
    st.ewma.foreach(ewma.update)
    alerts.iterator
  }
}
