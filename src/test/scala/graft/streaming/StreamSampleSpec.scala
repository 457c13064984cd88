package graft.streaming

import graft.SparkSpec
import graft.queries.CurationQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.util.Random

/** Streaming priority sampling: the DLT sketch is mergeable, so feeding
  * the corpus in ANY micro-batch split must end at exactly the batch
  * query's sample — same ids, same priorities, same tau. Also: bounded
  * emissions (≤ K per source per batch) and replay-dedup (a doc_id posted
  * twice occupies one candidate slot and counts once in n_seen).
  */
object StreamSampleSpec {
  // foreachBatch sink target (the memory sink cannot recover from a
  // checkpoint); static so executors/driver share one buffer in local mode
  val emissions =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Double, Double, Long)]()
}

class StreamSampleSpec extends SparkSpec {

  private val K = 4
  private val Salt = "tst"

  test("final streamed sample == batch prioritySample under a 3-way uneven split") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rnd = new Random(7)
    val docs = (for {
      (src, n) <- Seq("big" -> 23, "atk" -> K, "small" -> 2)
      i <- 0 until n
    } yield (src, src.hashCode.abs % 97 * 1000L + i, 1L + rnd.nextInt(900000))).toSeq
    val shuffled = rnd.shuffle(docs)

    val input = MemoryStream[(String, Long, Long)]
    val query = StreamSample.sample(spark, input.toDS(), K, Salt)
      .toDF("source", "doc_id", "n_chars", "p", "tau", "n_seen")
      .writeStream.format("memory").queryName("psample")
      .outputMode("append").start()
    try {
      // uneven batches: 3 docs, then most of the corpus, then the tail
      Seq(shuffled.take(3), shuffled.slice(3, 25), shuffled.drop(25)).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
      // current emission per source = rows carrying that source's max n_seen
      val all = spark.table("psample").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5)))
      val current = all.toSeq.groupBy(_._1).values.flatMap { rs =>
        val last = rs.map(_._6).max
        rs.filter(_._6 == last)
      }.toSeq
      // n_seen of the final emission is the source's full corpus size
      for ((src, n) <- Seq("big" -> 23, "atk" -> K, "small" -> 2))
        assert(current.filter(_._1 == src).forall(_._6 == n), s"$src n_seen")

      val want = CurationQueries.prioritySample(
          docs.toDF("source", "doc_id", "n_chars"), K, Salt)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getDouble(3), r.getDouble(4)))).toMap
      val got = current
        .map(t => (t._1, t._2) -> ((t._4, math.max(t._3.toDouble, t._5)))).toMap
      assert(got.keySet == want.keySet, "sampled-id sets differ from batch")
      for ((k, (p, wh)) <- want) {
        // batch outputs are r4-rounded; the stream emits raw doubles
        assert(math.abs(got(k)._1 - p) < 1e-4, s"$k priority")
        assert(math.abs(got(k)._2 - wh) < 1e-4, s"$k w_hat")
      }
      // bounded emissions: never more than K rows per source per batch
      assert(all.groupBy(t => (t._1, t._6)).forall(_._2.size <= K))
    } finally query.stop()
  }

  test("sampler state survives a query restart from checkpoint") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("psmp_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("psmp_ckpt").toString
    val rnd = new Random(11)
    val docs = (0 until 30).map(i => ("s", 100L + i, 1L + rnd.nextInt(900000)))
    def writeBatch(name: String, b: Seq[(String, Long, Long)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Path.of(inDir, name),
        b.map { case (s, id, w) =>
          s"""{"source":"$s","doc_id":$id,"n_chars":$w}"""
        }.mkString("", "\n", "\n"))
    def startQuery() =
      StreamSample.sample(spark,
          spark.readStream.schema("source STRING, doc_id LONG, n_chars LONG")
            .json(inDir).as[(String, Long, Long)], K, Salt)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[(String, Long, Long, Double, Double, Long)], _: Long) =>
          b.collect().foreach(StreamSampleSpec.emissions.add)
        }
        .start()

    writeBatch("b1.json", docs.take(20))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    writeBatch("b2.json", docs.drop(20))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val all = StreamSampleSpec.emissions.asScala.toSeq
      val current = all.filter(_._6 == all.map(_._6).max)
      assert(current.head._6 == 30, "n_seen must count pre-restart docs")
      // the post-restart sample equals the batch sample over ALL 30 docs —
      // possible only if the pre-restart candidate ListState was restored
      // (the final batch alone holds just 10 of the 30)
      val want = CurationQueries.prioritySample(
          docs.toDF("source", "doc_id", "n_chars"), K, Salt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(current.map(_._2).toSet == want)
    } finally q2.stop()
  }

  test("replayed doc_id occupies one slot and counts once in n_seen") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val query = StreamSample.sample(spark, input.toDS(), K, Salt)
      .toDF("source", "doc_id", "n_chars", "p", "tau", "n_seen")
      .writeStream.format("memory").queryName("psample2")
      .outputMode("append").start()
    try {
      input.addData(("s", 1L, 100L), ("s", 1L, 100L), ("s", 2L, 50L))
      query.processAllAvailable()
      input.addData(("s", 2L, 50L), ("s", 3L, 10L)) // cross-batch replay of 2
      query.processAllAvailable()
      val rows = spark.table("psample2").collect()
        .map(r => (r.getLong(1), r.getLong(5)))
      assert(rows.map(_._2).max == 3, "three distinct docs seen")
      val last = rows.filter(_._2 == 3).map(_._1).toSet
      assert(last == Set(1L, 2L, 3L), "census: all three docs in the sample")
    } finally query.stop()
  }
}
