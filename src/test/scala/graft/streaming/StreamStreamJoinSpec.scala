package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream-stream formulation of J3 (geo mismatch): a watermarked
  * interval self-join pairs events of the same entity with conflicting
  * geo tags within 2 minutes — the alternative SURVEY §2.4 names to the
  * collect_set window used by q_r3_tag_mismatch. State on both sides is
  * bounded by the watermark + interval condition.
  */
class StreamStreamJoinSpec extends SparkSpec {

  test("interval self-join flags conflicting geo within 2 minutes, bounded state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    val base = input.toDF().toDF("entity_id", "ts", "geo")
    val l = base.withWatermark("ts", "1 minute").alias("l")
    val r = base.withWatermark("ts", "1 minute").alias("r")
    val joined = l.join(r,
        col("l.entity_id") === col("r.entity_id") &&
          col("l.geo") =!= col("r.geo") &&
          col("r.ts") > col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr("INTERVAL 2 MINUTES"))
      .select(col("l.entity_id").as("entity_id"),
        col("l.geo").as("geo_a"), col("r.geo").as("geo_b"),
        col("r.ts").as("at"))
    val query = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      input.addData(
        ("e1", ts("2024-01-01T00:00:00Z"), "US"),
        ("e1", ts("2024-01-01T00:01:00Z"), "DE"), // conflict within 2 m
        ("e2", ts("2024-01-01T00:00:30Z"), "US"),
        ("e2", ts("2024-01-01T00:00:45Z"), "US")) // same geo: no alert
      query.processAllAvailable()
      // an event far outside the interval must NOT pair with e1's first
      input.addData(("e1", ts("2024-01-01T00:10:00Z"), "FR"))
      query.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows.contains(("e1", "US", "DE")))
      assert(!rows.exists(t => t._1 == "e2"), "same-geo events must not alert")
      assert(!rows.contains(("e1", "US", "FR")),
        "conflict outside the 2-minute interval must not alert")
      assert(!rows.contains(("e1", "DE", "FR")),
        "00:01 DE -> 00:10 FR is outside the interval too")
    } finally query.stop()
  }
}
