package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** A9 rolling counter on the modern `transformWithState` API (Spark 4):
  * per-key 1-minute buckets with trailing-24h totals, state held in a
  * `MapState[bucket, count]` backed by the RocksDB state store — the
  * arbitrary-state successor to flatMapGroupsWithState, with typed state
  * variables, TTL support, and changelog checkpointing.
  *
  * Emits one row per input event: (key, bucket, count-in-bucket,
  * trailing-24h total) — the streaming mirror of q_rolling_counter_24h.
  *
  * Dead-key tradeoff: a key that stops sending pins its last ≤ 1440
  * buckets forever — state is O(distinct keys ever seen). Same deliberate
  * decision, for the same reasons, as EntityAlertProcessor (see its doc:
  * processing-time TTL and event-time cleanup timers were both rejected);
  * bound the key space upstream for ephemeral-key workloads.
  */
class RollingCounterProcessor
  extends StatefulProcessor[String, (String, Timestamp), (String, Long, Long, Long)] {

  private val BucketMs = 60000L
  private val DayMs = 86400000L

  @transient private var buckets: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buckets = getHandle.getMapState[Long, Long](
      "buckets", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      inputRows: Iterator[(String, Timestamp)],
      timerValues: TimerValues): Iterator[(String, Long, Long, Long)] = {
    // read state ONCE per call, fold in memory, write back only the
    // touched keys — per-row MapState scans would be O(rows x buckets)
    // RocksDB reads, and rewriting untouched buckets would be O(buckets)
    // changelog writes per batch
    var live = collection.mutable.Map.empty[Long, Long]
    buckets.iterator().foreach { case (b, c) => live.update(b, c) }
    val removed = collection.mutable.Set.empty[Long]
    val updated = collection.mutable.Set.empty[Long]
    val out = Seq.newBuilder[(String, Long, Long, Long)]
    inputRows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts) =>
      val t = ts.getTime
      val b = (t / BucketMs) * BucketMs
      val cnt = live.getOrElse(b, 0L) + 1L
      live.update(b, cnt)
      updated += b
      val horizon = ((t - DayMs) / BucketMs) * BucketMs
      live.keysIterator.filter(_ < horizon).toList.foreach { k =>
        live.remove(k); removed += k; updated -= k
      }
      // total bounded BOTH ways: a late event must not count buckets after
      // its own (mirrors the batch RANGE ... AND CURRENT ROW frame). A
      // late event older than (max-seen - 24h) sees already-pruned state
      // and undercounts — inherent to bounded state, same as the
      // reference's bucket eviction.
      val total = live.iterator.collect { case (k, c) if k <= b => c }.sum
      out += ((key, b, cnt, total))
    }
    removed.foreach(buckets.removeKey)
    updated.foreach(k => buckets.updateValue(k, live(k)))
    out.result().iterator
  }
}

object RollingCounterProcessor {

  /** events: (key, ts). Requires the RocksDB state store provider
    * (Sessions.streaming sets it).
    */
  def counts(spark: SparkSession, events: Dataset[(String, Timestamp)])
  : Dataset[(String, Long, Long, Long)] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new RollingCounterProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
