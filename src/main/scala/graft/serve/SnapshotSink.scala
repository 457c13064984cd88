package graft.serve

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Serving-layer pieces (SURVEY §2.1 S9–S12, §2.6 W7, §2.3 A10).
  *
  * Spark ends at foreachBatch; an HTTP/SSE layer consumes these hubs. The
  * engine-side contracts — changed-only emission, top-N projection,
  * observe() counters — are what's implemented and tested here.
  */
object SnapshotSink {

  /** W7/S11: changed-only snapshot hub. `push` each micro-batch's
    * projection; listeners (SSE handlers) are invoked only when the
    * snapshot differs from the previous one (reference
    * `CdpController.kt:105-139`).
    */
  final class ChangedOnlyHub[T] {
    private val last = new AtomicReference[Option[Seq[T]]](None)
    private val listenersRef = new AtomicReference[List[Seq[T] => Unit]](Nil)
    @volatile private var emitted = 0L

    def subscribe(f: Seq[T] => Unit): Unit =
      listenersRef.updateAndGet(f :: _)

    def emitCount: Long = emitted

    /** Returns true if the snapshot changed and was emitted. Synchronized:
      * concurrent pushes must not lose emit counts or deliver snapshots to
      * listeners out of order.
      */
    def push(snapshot: Seq[T]): Boolean = synchronized {
      val prev = last.getAndSet(Some(snapshot))
      val changed = !prev.contains(snapshot)
      if (changed) {
        emitted += 1
        listenersRef.get.foreach(_(snapshot))
      }
      changed
    }
  }

  /** P5/S11: the top-N profile projection (order by lastSeen desc, strip
    * identifier prefixes) — the exact shape the snapshot hub publishes.
    */
  def topNProfiles(profiles: DataFrame, n: Int): DataFrame =
    profiles
      .orderBy(col("lastSeen").desc, col("profileId"))
      .limit(n)
      .withColumn("identifiers",
        transform(col("identifiers"),
          id => regexp_replace(id, "^(user:|email:|anon:)", "")))

  /** A10: global stats via observe() — events/alerts counted per batch;
    * read from StreamingQueryProgress.observedMetrics (no extra action,
    * no driver-side state).
    */
  def observed(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))
}
