package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState rolling counter on the RocksDB state store: bucket
  * counts accumulate across micro-batches, 24h horizon prunes.
  */
class RollingCounterProcessorSpec extends SparkSpec {

  test("bucket counts and 24h totals across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(String, java.sql.Timestamp)]
      val query = RollingCounterProcessor.counts(spark, input.toDS())
        .toDF("key", "bucket", "cnt", "total24h")
        .writeStream.format("memory").queryName("twscounter")
        .outputMode("append").start()
      try {
        input.addData(("u1", ts("2024-01-01T00:00:10Z")), ("u1", ts("2024-01-01T00:00:50Z")))
        query.processAllAvailable()
        input.addData(("u1", ts("2024-01-01T00:05:00Z"))) // later batch, state persists
        input.addData(("u1", ts("2024-01-02T00:30:00Z"))) // next day: horizon prunes
        query.processAllAvailable()
        val rows = spark.table("twscounter").as[(String, Long, Long, Long)].collect()
          .sortBy(r => (r._2, r._3))
        // same minute bucket increments: cnt 1 then 2; totals 1, 2
        assert(rows.map(r => (r._3, r._4)).toSeq ==
          Seq((1L, 1L), (2L, 2L), (1L, 3L), (1L, 1L)))
      } finally query.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
