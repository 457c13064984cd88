package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A5: exponentially weighted moving average per key, seeded with the first
  * observation (reference `core/WindowStore.kt:106-132`: the first call
  * creates state holding the value itself, so e_1 = x_1 and
  * e_k = alpha * x_k + (1 - alpha) * e_{k-1}).
  *
  * The recurrence is order-dependent and therefore not a commutative
  * aggregate; the Spark-native shape is a per-key iterator fold over rows
  * secondary-sorted by event time: `groupByKey(...).flatMapSortedGroups`.
  * That is one shuffle on the key and a streaming (no-buffering) pass per
  * group — at 100 TB each key's fold is sequential but keys parallelize
  * across executors, which is the best any order-dependent recurrence can
  * do. (The closed form sum_j alpha(1-a)^(k-j) x_j needs per-row coefficient
  * (1-a)^(-j) which overflows for long histories, so it is not a scalable
  * alternative; it is only used by the DuckDB oracle at small SF.)
  */
object Ewma {

  case class In(key1: Long, key2: String, ordTs: Long, ordId: Long, x: Double)
  case class Out(user_id: Long, event_type: String, event_id: Long, ewma: Double)

  /** Per-event EWMA (the value *after* folding in the current row — R2's
    * "updatedEwma", `core/Rules.kt:70-74`).
    */
  def perEvent(spark: SparkSession, events: DataFrame, alpha: Double): Dataset[Out] = {
    import spark.implicits._
    events
      .select(
        col("user_id").as("key1"), col("event_type").as("key2"),
        unix_micros(col("ts")).as("ordTs"), col("event_id").as("ordId"),
        col("value").as("x"))
      .as[In]
      .groupByKey(r => (r.key1, r.key2))
      .flatMapSortedGroups($"ordTs", $"ordId") { case ((k1, k2), rows) =>
        var ewma = 0.0
        var first = true
        rows.map { r =>
          ewma = if (first) { first = false; r.x }
                 else alpha * r.x + (1 - alpha) * ewma
          Out(k1, k2, r.ordId, ewma)
        }
      }
  }
}
