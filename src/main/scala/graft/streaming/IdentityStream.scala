package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Identity

/** Streaming identity resolution (SURVEY §7.4 hard-part 1, reference
  * `cdp/identity/IdentityGraph.kt` + `docs/cdp/README.md:85-126`).
  *
  * Contract adopted from the reference: a late ALIAS that merges two
  * existing components re-keys only FUTURE events — the mapping table is
  * updated, historical per-profile state is not migrated (orphaned
  * profiles are accepted). That makes streaming resolution feasible: the
  * mapping is a monotone join of components.
  *
  * Mechanics: `foreachBatch` accumulates the distinct edge set (checkpoint
  * parquet dir — at cluster scale a Delta/iceberg table) and recomputes
  * connected components over it per batch with the deterministic
  * lexicographically-smallest-root rule. Component recompute is
  * incremental-friendly because edges only accumulate; for graphs where
  * full recompute is too heavy, seed the propagation with the previous
  * mapping (labels only ever decrease).
  */
object IdentityStream {

  /** Latest id -> canonicalId mapping, swapped atomically per batch. */
  final class MappingRef {
    private val ref = new AtomicReference[Map[String, String]](Map.empty)
    def get: Map[String, String] = ref.get
    def canonical(id: String): String = ref.get.getOrElse(id, id)
    private[IdentityStream] def set(m: Map[String, String]): Unit = ref.set(m)
  }

  /** Wire the resolver onto a stream of (src, dst) identifier edges.
    * Returns the writer (caller starts it) and the live mapping handle.
    */
  def resolver(spark: SparkSession, edges: DataFrame, edgeStateDir: String,
               maxIter: Int = 100)
  : (DataStreamWriter[org.apache.spark.sql.Row], MappingRef) = {
    val mapping = new MappingRef
    val writer = edges.writeStream
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newEdges = batch.select("src", "dst").distinct()
        // accumulate edge state (append; CC dedups via distinct)
        newEdges.write.mode("append").parquet(edgeStateDir)
        val allEdges = spark.read.parquet(edgeStateDir).distinct()
        // keep the previous (monotone-safe) mapping if a pathological
        // component exceeds the iteration bound — never kill the stream
        try {
          val cc = Identity.connectedComponents(allEdges, maxIter)
          mapping.set(cc.collect().map(r => r.getString(0) -> r.getString(1)).toMap)
        } catch {
          case e: IllegalArgumentException =>
            System.err.println(s"[identity] keeping previous mapping: ${e.getMessage}")
        }
        ()
      }
    (writer, mapping)
  }
}
