package graft.streaming

import graft.SparkSpec
import graft.queries.PiiQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The PII scrub is a stateless map-only regex projection, so the SAME
  * operator code runs unchanged under Structured Streaming in append mode
  * with zero state — scrub-on-ingest, no batch re-pass. Drives
  * `PiiQueries.scan`/`redact` over MemoryStream micro-batches and asserts
  * row-for-row parity with the batch run, plus the scrub invariant: a
  * second scan over redacted text finds nothing.
  */
class StreamPiiSpec extends SparkSpec {

  // doc_ids chosen to hit every injection class (multiples of 5/7/11/13/17)
  // plus untouched ids
  private val ids = Seq(1L, 5L, 7L, 11L, 13L, 17L, 35L, 55L, 85L, 91L, 1105L, 12L)
  private def docs = ids.map(i => (i, s"plain words for doc $i"))

  test("streaming PII scan + redact: stateless append, batch parity, clean rescan") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val out = PiiQueries.redact(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("pii_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.grouped(4).foreach { g =>
        input.addData(g)
        q.processAllAvailable()
      }
      val streamed = spark.table("pii_stream")
        .as[(Long, String, Int)].collect().toSet
      val batch = PiiQueries.redact(docs.toDF("doc_id", "text"))
        .as[(Long, String, Int)].collect().toSet
      assert(streamed == batch,
        s"only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
      // injected classes actually fired and were removed
      assert(streamed.count(_._3 > 0) >= 10,
        s"expected most docs redacted: ${streamed.toSeq.sortBy(_._1)}")
      // scrub invariant: scanning the REDACTED text finds zero hits of any
      // class (tokens like <EMAIL> match no pattern)
      val rescan = PiiQueries.scan(
        spark.table("pii_stream").selectExpr("doc_id % 2 + 2 AS doc_id",
          "redacted AS text"))
      // doc_id remapped to 2..3 so the scan's own injection step is a no-op
      // (neither is a multiple of 5/7/11/13/17)
      val hits = rescan
        .selectExpr("n_email + n_phone + n_ipv4 + n_key + n_secret AS h")
        .as[Int].collect()
      assert(hits.forall(_ == 0), s"redacted text still scans dirty: ${hits.toSeq}")
    } finally q.stop()
  }
}
