package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Event-anchored sliding-window aggregates (reference WindowStore semantics:
  * `core/WindowStore.kt:55-147` — every query is a count/sum/avg over
  * `[anchor - dur, anchor]`, bounds inclusive).
  *
  * The batch re-expression anchors the window at each event's own timestamp
  * (replay semantics: when the event was processed, "now" was its event
  * time) and uses a `RANGE BETWEEN` frame over epoch microseconds, so the
  * whole computation is one shuffle on the key plus an in-partition sort —
  * no self-join, no state. At 100 TB this scales linearly: each (key)
  * partition is processed independently and the frame is maintained
  * incrementally by the window exec operator.
  */
object SlidingWindows {

  /** Frame over `[ts - seconds, ts]`, inclusive on both ends — matches the
    * reference's `countInRange(start <= ts <= end)`.
    */
  def frame(keys: Seq[Column], tsMicros: Column, seconds: Long): WindowSpec =
    Window.partitionBy(keys: _*).orderBy(tsMicros)
      .rangeBetween(-seconds * 1000000L, 0L)

  /** A1 ratePerMin: events per minute = count over the trailing 60 s. */
  def ratePerMin(keys: Seq[Column], tsMicros: Column): Column =
    count(lit(1)).over(frame(keys, tsMicros, 60)).cast("double")

  /** A2 countIn. */
  def countIn(keys: Seq[Column], tsMicros: Column, seconds: Long): Column =
    count(lit(1)).over(frame(keys, tsMicros, seconds))

  /** A3 sumIn (0 when empty, per reference). */
  def sumIn(keys: Seq[Column], tsMicros: Column, value: Column, seconds: Long): Column =
    coalesce(sum(value).over(frame(keys, tsMicros, seconds)), lit(0.0))

  /** A4 avgOverLast = sumIn/countIn, 0.0 when the window is empty
    * (`core/WindowStore.kt:137-147`).
    */
  def avgOverLast(keys: Seq[Column], tsMicros: Column, value: Column, seconds: Long): Column = {
    val c = countIn(keys, tsMicros, seconds)
    when(c === 0, lit(0.0)).otherwise(
      sumIn(keys, tsMicros, value, seconds) / c.cast("double"))
  }

  /** Distinct values of `tag` in the trailing window — the real
    * implementation of the reference's R3 geo/device conflict spec
    * (`core/Rules.kt:98-154`, stubbed there; see `docs/TICKETS.md:146`).
    */
  def distinctInWindow(keys: Seq[Column], tsMicros: Column, tag: Column, seconds: Long): Column =
    size(array_distinct(collect_list(tag).over(frame(keys, tsMicros, seconds))))

  /** Convenience: standard entity-analytics columns appended to an event
    * DataFrame. `keys` are the entity identity (e.g. user_id, event_type).
    */
  def withSlidingAggs(df: DataFrame, keys: Seq[Column], ts: Column, value: Column): DataFrame = {
    val us = unix_micros(ts)
    // the 5m count and raw 5m sum are each computed ONCE and reused by the
    // three outputs that read them: WindowExec gives every aggregate in
    // the merged window-expression list its own frame buffer, so spelling
    // avg_5m as avgOverLast(...) re-evaluated the 300 s count and sum
    // frames a second (and third) time per row (r19; identical values —
    // avg divides the same raw sum by the same count, rounding unchanged)
    df.withColumn("rate_60s", ratePerMin(keys, us))
      .withColumn("cnt_60s", countIn(keys, us, 60))
      .withColumn("sum_30s", Num.r4(sumIn(keys, us, value, 30)))
      .withColumn("sum_5m_raw", sumIn(keys, us, value, 300))
      .withColumn("cnt_5m", countIn(keys, us, 300))
      .withColumn("sum_5m", Num.r4(col("sum_5m_raw")))
      .withColumn("avg_5m", Num.r4(
        when(col("cnt_5m") === 0, lit(0.0))
          .otherwise(col("sum_5m_raw") / col("cnt_5m").cast("double"))))
      .drop("sum_5m_raw")
  }
}
