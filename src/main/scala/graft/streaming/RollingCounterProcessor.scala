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
    val out = Seq.newBuilder[(String, Long, Long, Long)]
    inputRows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts) =>
      val t = ts.getTime
      val b = (t / BucketMs) * BucketMs
      val cnt = (if (buckets.containsKey(b)) buckets.getValue(b) else 0L) + 1L
      buckets.updateValue(b, cnt)
      // prune buckets outside the trailing 24 h and total the remainder
      val horizon = ((t - DayMs) / BucketMs) * BucketMs
      var total = 0L
      buckets.iterator().foreach { case (bucket, count) =>
        if (bucket < horizon) buckets.removeKey(bucket)
        else total += count
      }
      out += ((key, b, cnt, total))
    }
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
