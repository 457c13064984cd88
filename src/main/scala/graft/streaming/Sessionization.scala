package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization on Spark's native `session_window`:
  * dynamic event-time windows that extend while events keep arriving
  * within `gap` of each other and close when the watermark passes the
  * last event + gap.
  *
  * This is the streaming twin of the batch q_sessionization query (lag +
  * running-sum window): same 30-minute-gap semantics, but incremental —
  * session state is native window-merge state (merged on the shuffle by
  * key+overlap), evicted by the watermark, and closed sessions are
  * emitted exactly once in Append mode. At scale the shuffle is on the
  * session key only; skewed keys are handled by AQE like any keyed agg.
  */
object Sessionization {

  /** Closed sessions per key: (user_id, session_start, session_end,
    * n_events). `events` needs columns (user_id, ts); watermark delay
    * bounds how late an event may extend a session.
    */
  def sessions(events: Dataset[_], gap: String, watermarkDelay: String): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))
}
