package graft

import org.apache.spark.sql.functions._

/** `Tables.normalizeEventsTs` — the streaming twin of the adaptive events
  * ts conversion (StreamParity's file source reads events.parquet raw and
  * must apply the SAME unit resolution the batch loader probed):
  *  1. an unprobed dir fails fast (the probe needs a batch max(abs) job,
  *     which a streaming frame cannot run — guessing a unit here is the
  *     silent-1000x-skew corruption the probe exists to refuse);
  *  2. after the batch probe, normalizing a raw read of the same dir
  *     yields timestamps identical to `Tables.events`' own output.
  */
class TablesTsSpec extends SparkSpec {

  test("normalizeEventsTs refuses an unprobed dir") {
    val dir = "/root/testdata/definitely-not-probed"
    val df = spark.range(1).selectExpr("timestamp'2024-01-01' AS ts")
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventsTs(dir, df)
    }
    assert(e.getMessage.contains("not probed"))
  }

  test("after the batch probe, a raw read normalizes to the batch ts") {
    val dir = "/root/testdata/sf0.001"
    val batch = Tables.events(spark, dir) // resolves + caches the unit
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val normalized = Tables.normalizeEventsTs(dir, raw)
    // identical (event_id, epoch-µs) sets — the unit conversion agrees
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy(col("event_id")).limit(500).collect().toSeq
    assert(canon(normalized) === canon(batch))
  }
}
