package graft.serve

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedDeque
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.PiiQueries

/** Live corpus-curation ingest: the batch funnel's guards — PII scrub,
  * exact dedup, near-dup LSH admit — composed into ONE running Structured
  * Streaming pipeline behind `POST /corpus/ingest`.
  *
  * Per micro-batch (`foreachBatch`, batch semantics — the any-band OR of
  * the near-dup admit needs a per-doc aggregation append mode cannot
  * express without state, see `Dedup.nearDupAdmitBatch`):
  *   1. scrub: `PiiQueries.redactExpr` — map-only, no injection (real
  *      arrivals carry their own PII), redacted text is what gets admitted;
  *   2. exact dedup: md5 content hash, first occurrence per hash inside
  *      the batch wins (min doc_id), then arrivals whose hash exists in
  *      the PERSISTED corpus hash index are rejected;
  *   3. near-dup guard: rowwise minhash band keys probed against the
  *      persisted band index (`Dedup.bandProbeStream`'s shape) — any band
  *      hit rejects;
  *   4. admitted docs EXTEND both indexes (hash + band rows appended), so
  *      later batches are guarded against earlier admissions — true
  *      corpus extension, not a static snapshot.
  *
  * The indexes here are plain parquet append logs — the serving-side
  * shape. At 100 TB the logs compact periodically into the bucketed,
  * key-slot-partitioned layout (`Dedup.writeBandIndexPruned`) that the
  * batch funnel probes with partition pruning; the per-batch append and
  * the probe join are unchanged by that swap.
  *
  * Docs shorter than the shingle width (n=5 words) produce no band keys:
  * they pass the near-dup guard trivially but are still exact-dedup'd by
  * content hash — same contract as the batch funnel.
  */
object CurationPipeline {

  val ShingleN = 5
  val MaxDecisions = 200

  final case class Decision(docId: Long, decision: String, reason: String,
                            charsRedacted: Long)

  /** Driver-side counters + a bounded recent-decision log for the REST
    * surface (the reference's in-memory stats pattern).
    */
  final class Stats {
    val received = new AtomicLong
    val admitted = new AtomicLong
    val rejectedExactBatch = new AtomicLong
    val rejectedExactCorpus = new AtomicLong
    val rejectedNearDup = new AtomicLong
    val charsRedacted = new AtomicLong
    private val decisions = new ConcurrentLinkedDeque[Decision]()

    def record(d: Decision): Unit = {
      d.decision match {
        case "admitted" => admitted.incrementAndGet()
        case _ => d.reason match {
          case "exact_dup_batch"  => rejectedExactBatch.incrementAndGet()
          case "exact_dup_corpus" => rejectedExactCorpus.incrementAndGet()
          case "near_dup_corpus"  => rejectedNearDup.incrementAndGet()
        }
      }
      charsRedacted.addAndGet(d.charsRedacted)
      decisions.addFirst(d)
      while (decisions.size > MaxDecisions) decisions.pollLast()
      ()
    }

    def recent: Seq[Decision] = decisions.iterator().asScala.toSeq

    def json: String = {
      val recentJson = recent.take(50).map { d =>
        s"""{"docId":${d.docId},"decision":"${d.decision}","reason":"${d.reason}","charsRedacted":${d.charsRedacted}}"""
      }.mkString("[", ",", "]")
      s"""{"received":${received.get},"admitted":${admitted.get},"rejected_exact_batch":${rejectedExactBatch.get},"rejected_exact_corpus":${rejectedExactCorpus.get},"rejected_near_dup":${rejectedNearDup.get},"chars_redacted":${charsRedacted.get},"decisions":$recentJson}"""
    }
  }

  private def emptyDf(spark: SparkSession, schemaDdl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  // Try-guarded: the log directory may not exist yet, or may hold only a
  // _SUCCESS marker (an all-rejected batch appends zero part files)
  private def readOrEmpty(spark: SparkSession, path: String,
                          schemaDdl: String): DataFrame =
    if (!new java.io.File(path).exists()) emptyDf(spark, schemaDdl)
    else scala.util.Try(spark.read.parquet(path))
      .getOrElse(emptyDf(spark, schemaDdl))

  /** Admit one micro-batch (columns doc_id, ts, text) through the full
    * funnel; records a Decision per doc and appends admitted docs' hash
    * and band rows to the index logs.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame,
                 hashPath: String, bandPath: String, stats: Stats): Unit = {
    if (batch.isEmpty) return
    // 1. scrub (map-only)
    val scrubbed = batch
      .withColumn("redacted", PiiQueries.redactExpr(col("text")))
      .withColumn("chars_redacted",
        (length(col("text")) - length(col("redacted"))).cast("long"))
      .select(col("doc_id"), col("redacted").as("text"), col("chars_redacted"))
      .withColumn("text_hash", md5(col("text")))
      .localCheckpoint() // several consumers below; the batch is micro-sized
    // 2a. intra-batch exact: first arrival (min doc_id) per hash wins
    val keeper = scrubbed.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("__keeper"))
    // 2b. corpus exact: hash present in the persisted index
    val idxHash = readOrEmpty(spark, hashPath, "text_hash STRING")
    val flagged = scrubbed
      .join(keeper, "text_hash")
      .join(idxHash.select(col("text_hash"), lit(true).as("__in_corpus")).distinct(),
        Seq("text_hash"), "left")
      .select(col("doc_id"), col("text"), col("text_hash"), col("chars_redacted"),
        (col("doc_id") =!= col("__keeper")).as("batch_dup"),
        coalesce(col("__in_corpus"), lit(false)).as("corpus_dup"))
      .localCheckpoint()
    // 3. near-dup guard for exact survivors: band keys vs the band index
    val survivors = flagged.filter(!col("batch_dup") && !col("corpus_dup"))
    val idxBands = readOrEmpty(spark, bandPath, "id BIGINT, band INT, key STRING")
    val probeBands = Dedup.bandKeys(Dedup.minhashSignaturesRowwise(
      survivors, col("doc_id"), col("text"), ShingleN))
    val nearHit = Dedup.candidatePairsAcross(idxBands, probeBands)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("__near", lit(true))
    val decided = flagged
      .join(nearHit, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("text_hash"), col("chars_redacted"),
        col("batch_dup"), col("corpus_dup"),
        coalesce(col("__near"), lit(false)).as("near_dup"))
      .localCheckpoint()
    // 4. extend the indexes with the admissions BEFORE recording decisions
    // (a crash between the two leaves the guard stricter, never looser)
    val admitted = decided
      .filter(!col("batch_dup") && !col("corpus_dup") && !col("near_dup"))
    if (!admitted.isEmpty) {
      admitted.select(col("text_hash"))
        .write.mode("append").parquet(hashPath)
      val newBands = Dedup.bandKeys(Dedup.minhashSignaturesRowwise(
        admitted, col("doc_id"), col("text"), ShingleN))
      // all-short-doc batches produce no band rows; an empty append would
      // leave a schema-less directory behind
      if (!newBands.isEmpty) newBands.write.mode("append").parquet(bandPath)
    }
    decided.select("doc_id", "batch_dup", "corpus_dup", "near_dup", "chars_redacted")
      .collect()
      .sortBy(_.getLong(0))
      .foreach { r =>
        val (id, cr) = (r.getLong(0), r.getLong(4))
        val d =
          if (r.getBoolean(1)) Decision(id, "rejected", "exact_dup_batch", cr)
          else if (r.getBoolean(2)) Decision(id, "rejected", "exact_dup_corpus", cr)
          else if (r.getBoolean(3)) Decision(id, "rejected", "near_dup_corpus", cr)
          else Decision(id, "admitted", "", cr)
        stats.record(d)
      }
  }
}

/** POST /corpus/ingest body handling: `{"docId":<long>,"text":"..."}` →
  * validated, stamped with arrival time, handed to the pipeline's source.
  * Driver-thread-local jackson, same as CdpIngest — one POST must not
  * cost a Spark job.
  */
final class CorpusIngest(sink: (Long, Timestamp, String) => Unit,
                         stats: CurationPipeline.Stats) {

  private val mapper = new ObjectMapper()

  def handle(body: String): Either[String, Long] = {
    val root =
      try mapper.readTree(body)
      catch { case e: Exception => return Left(s"malformed JSON: ${e.getMessage}") }
    val idNode = root.path("docId")
    if (!idNode.canConvertToLong) return Left("docId must be an integer")
    val text = root.path("text").asText("")
    if (text.trim.isEmpty) return Left("text must not be blank")
    stats.received.incrementAndGet()
    sink(idNode.asLong, new Timestamp(System.currentTimeMillis()), text)
    Right(idNode.asLong)
  }
}
