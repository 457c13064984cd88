package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8: deterministic synthetic event generator, reproducing the
  * reference simulator's distributions (`ingest/Simulator.kt:85-407`) as a
  * pure column program over `spark.range` — no RNG state, every value a
  * hash of (seed, index), so any two runs (or engines) agree row-for-row.
  *
  * Distributions mirrored:
  *  - SASE: CONN_OPEN 50% / CONN_BYTES 30% / LOGIN 20% (10% failed logins)
  *  - IGAMING: BET_PLACED 60% / CASHIN 20% / LOGIN 20%
  *  - inter-arrival jitter x0.5–1.5 around 1/rps
  *  - event-time jitter ±latenessSec
  *  - ~5% duplicated eventIds (re-use of the previous id)
  *
  * For a live stream, apply the same columns over `format("rate")`.
  */
object Simulator {

  private def u(seed: Long, idx: org.apache.spark.sql.Column, salt: String) =
    (abs(xxhash64(lit(seed), idx, lit(salt))) % 1000000L) / 1000000.0

  /** The shared per-index column program; `baseMs` supplies arrival time
    * (batch: jittered cumulative gaps; stream: the rate-source clock).
    */
  private def eventColumns(seed: Long, profile: String,
                           idx: org.apache.spark.sql.Column,
                           baseMs: org.apache.spark.sql.Column,
                           latenessSec: Int): Seq[org.apache.spark.sql.Column] = {
    val mix = u(seed, idx, "mix")
    val eventType = profile match {
      case "SASE" =>
        when(mix < 0.5, "CONN_OPEN").when(mix < 0.8, "CONN_BYTES").otherwise("LOGIN")
      case _ =>
        when(mix < 0.6, "BET_PLACED").when(mix < 0.8, "CASHIN").otherwise("LOGIN")
    }
    val jitterMs = ((u(seed, idx, "late") - 0.5) * 2 * latenessSec * 1000).cast("long")
    val dup = u(seed, idx, "dup") < 0.05 && idx > 0
    Seq(
      when(dup, concat(lit("ev-"), idx - 1)).otherwise(concat(lit("ev-"), idx))
        .as("eventId"),
      timestamp_millis(baseMs + jitterMs).as("ts"),
      concat(lit("entity-"), (abs(xxhash64(lit(seed), idx, lit("ent"))) % 50)).as("entityId"),
      lit(profile).as("profile"),
      eventType.as("eventType"),
      when(eventType === "CONN_BYTES",
        (abs(xxhash64(lit(seed), idx, lit("val"))) % 100000L))
        .when(eventType === "BET_PLACED",
          (abs(xxhash64(lit(seed), idx, lit("val"))) % 500L))
        .otherwise(lit(1L)).as("value"),
      map(lit("status"),
        when(eventType === "LOGIN" && u(seed, idx, "fail") < 0.1, "FAILED")
          .otherwise("OK")).as("tags"))
  }

  def entityEvents(spark: SparkSession, n: Long, seed: Long = 42L,
                   rps: Double = 10.0, latenessSec: Int = 90,
                   profile: String = "SASE",
                   startEpochMs: Long = 1704067200000L): DataFrame = {
    val idx = col("id")
    // jittered inter-arrival: mean 1000/rps ms, x0.5..1.5
    val gapMs = (lit(1000.0 / rps) * (u(seed, idx, "gap") + 0.5)).cast("long")
    val baseMs = lit(startEpochMs) +
      sum(gapMs).over(org.apache.spark.sql.expressions.Window.orderBy(idx)
        .rowsBetween(Long.MinValue, 0))
    spark.range(n).toDF("id")
      .select(eventColumns(seed, profile, idx, baseMs, latenessSec): _*)
  }

  /** Live variant over the rate source: same deterministic per-index
    * columns, arrival time from the source clock (so event time ≈ now ±
    * lateness jitter, like the reference's wall-clock simulator). The
    * schema matches `EntityEvent` minus the `profile` tag column.
    * `idxOffset` shifts the deterministic index space — a reconfigured
    * generator restarts the rate source at value 0, and without the offset
    * it would re-issue the previous generation's eventIds.
    */
  def entityEventStream(spark: SparkSession, rps: Double, latenessSec: Int,
                        profile: String = "SASE", seed: Long = 42L,
                        idxOffset: Long = 0L): DataFrame = {
    val idx = col("value") + lit(idxOffset)
    // the rate source takes an INTEGER rowsPerSecond: round() silently
    // turned rps=0.2 into 1 event/s (5x the configured rate) while the
    // serving surface kept reporting 0.2. Ceil instead, then THIN
    // deterministically down to the requested rate — integer rates are
    // untouched (rps == rows → no filter)
    val rows = math.max(1L, math.ceil(rps).toLong)
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rows)
      .load()
    val thinned =
      if (rps >= rows) base
      else base.filter(
        abs(xxhash64(col("value") + lit(idxOffset), lit("thin"), lit(seed))) % 1000000L
          < math.round(rps / rows * 1000000L))
    thinned
      .select(eventColumns(seed, profile, idx,
        (unix_micros(col("timestamp")) / 1000L).cast("long"), latenessSec): _*)
      .drop("profile", "tags")
      .withColumn("geo", lit(null).cast("string"))
      .withColumn("device", lit(null).cast("string"))
  }
}
