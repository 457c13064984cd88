package graft.streaming

import graft.SparkSpec
import graft.queries.PackingQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The chunk manifest is a stateless map-side explode, so the SAME
  * operator code runs unchanged under Structured Streaming in append mode
  * with zero state — at 100 TB the retrieval-unit explosion happens on
  * documents as they arrive, no batch re-pass. This spec drives
  * `PackingQueries.chunkManifest` over MemoryStream micro-batches and
  * asserts row-for-row parity with the batch run, including the window
  * boundaries (doc length exactly at / one over a stride multiple).
  */
class StreamChunkSpec extends SparkSpec {

  test("streaming chunk manifest: stateless append, row-for-row batch parity") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    def doc(id: Long, n: Int): (Long, String) =
      (id, (1 to n).map(i => s"w${id}_$i").mkString(" "))
    // lengths straddle the stride/width boundaries: 30 (one full stride,
    // single chunk), 31 (second chunk of exactly 1 token at start 31),
    // 40 (width, clamped second chunk), 41, 61 (1-token third chunk),
    // 95, 1, 10
    val docs = Seq(doc(1, 10), doc(2, 30), doc(3, 40), doc(4, 41),
      doc(5, 61), doc(6, 95), doc(7, 1), doc(8, 31))

    val input = MemoryStream[(Long, String)]
    val out = PackingQueries.chunkManifest(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("chunk_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.grouped(3).foreach { g =>
        input.addData(g)
        q.processAllAvailable()
      }
      val streamed = spark.table("chunk_stream")
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet
      val batch = PackingQueries.chunkManifest(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet
      assert(streamed == batch,
        s"only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")

      // chunk count per doc: starts at 1, 1+stride, ... while <= n
      val byDoc = streamed.groupBy(_._1).view.mapValues(_.size).toMap
      docs.foreach { case (id, text) =>
        val n = text.split(" ").length
        val expected = (n - 1) / PackingQueries.ChunkStride + 1
        assert(byDoc(id) == expected,
          s"doc $id ($n words): ${byDoc(id)} chunks, expected $expected")
      }
      // window geometry: starts advance by exactly the stride from 1, every
      // chunk is width-capped and clamped to the doc end, and the last
      // chunk reaches the final token (full coverage)
      streamed.groupBy(_._1).foreach { case (id, rows) =>
        val n = docs.find(_._1 == id).get._2.split(" ").length
        rows.foreach { case (_, chunkId, start, end, sz, _) =>
          assert(start == 1 + (chunkId - 1) * PackingQueries.ChunkStride,
            s"doc $id chunk $chunkId: start $start off the stride grid")
          assert(end == math.min(start + PackingQueries.ChunkSize - 1, n) &&
            sz == end - start + 1,
            s"doc $id chunk $chunkId: [$start,$end] sz=$sz not width-capped/clamped")
        }
        assert(rows.map(_._4).max == n,
          s"doc $id: last chunk ends at ${rows.map(_._4).max}, not $n")
      }
    } finally q.stop()
  }
}
