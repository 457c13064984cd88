package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training prep: GPT-style concat-and-cut. Per
  * source (one token stream per domain), documents are concatenated in
  * doc_id order and the stream is cut into fixed SeqLen-token training
  * sequences; documents may straddle a cut. The packing manifest maps
  * every document to its global token offset and the sequence range it
  * lands in — what a loader needs to materialize training batches
  * without re-tokenizing.
  *
  * The core primitive is a per-stream PREFIX SUM. The declarative
  * formulation — `sum(n) over (partition by source order by doc_id)` —
  * serializes each source through a single task: fine at test SF, a
  * straggler at 100 TB where one domain can be most of the corpus.
  * `endOffsets` instead implements the classic two-pass distributed scan:
  * range-repartition by (source, doc_id) so each partition holds a
  * contiguous co-sorted run, compute partition-local running totals, lift
  * the per-(partition, source) subtotals to the driver (bounded:
  * partitions × sources rows), exclusive-prefix them there, and broadcast
  * the base offsets back for the second pass. Cost: two narrow passes +
  * one range shuffle, parallel in the number of partitions, not sources.
  * Results are identical to the window formulation (parity-spec'd, and
  * the oracle SQL IS the window formulation).
  */
object Packing {

  val SeqLen = 512

  /** (doc_id, source, n_tokens) with the BPE-ish token count — same
    * tokenizer as q_token_count's bpe_tokens.
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("source"),
      // native twin of size(regexp_extract_all(text, TokenPattern)) —
      // AsciiCountsParitySpec pins equality; the oracle keeps its regexp
      org.apache.spark.sql.graft.ArrayExpressions.asciiTokenCount(col("text"))
        .cast("long").as("n_tokens"))

  /** Two-pass distributed per-source prefix sum:
    * (doc_id, source, n_tokens, end_off) where end_off is the inclusive
    * running token total within the source's doc_id-ordered stream.
    */
  def endOffsets(toks: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val nPart =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // contiguous co-sorted runs; cached so both passes see ONE partitioning
    val sorted = toks
      .select(col("doc_id").cast("long"), col("source"),
        col("n_tokens").cast("long"))
      .as[(Long, String, Long)]
      .repartitionByRange(nPart, col("source"), col("doc_id"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .cache()
    // pass 1: per-(partition, source) subtotals — bounded, collected
    val subtotals: Array[(Int, String, Long)] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (_, src, n) => acc(src) = acc.getOrElse(src, 0L) + n }
        acc.iterator.map { case (src, t) => (pid, src, t) }
      }.collect()
    // driver: exclusive prefix per source across partition ids
    val base: Map[(Int, String), Long] = subtotals
      .groupBy(_._2)
      .flatMap { case (src, rows) =>
        var running = 0L
        rows.sortBy(_._1).map { case (pid, _, t) =>
          val b = ((pid, src), running); running += t; b
        }
      }
    val bc = spark.sparkContext.broadcast(base)
    // pass 2: partition-local scan seeded with the broadcast base offsets
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val b = bc.value
      var cur: String = null
      var running = 0L
      it.map { case (id, src, n) =>
        if (src != cur) { cur = src; running = b.getOrElse((pid, src), 0L) }
        running += n
        (id, src, n, running)
      }
    }.toDF("doc_id", "source", "n_tokens", "end_off")
    out
  }

  /** The packing manifest: per document, its token offsets and the
    * SeqLen-cut sequence range. All-integer arithmetic (offsets are
    * non-negative, so truncating and flooring division agree). A
    * zero-token document (whitespace-only text) occupies NO sequence:
    * n_seqs = 0 with seq_last pinned to seq_first — the (end_off - 1)
    * formula would otherwise claim a training sequence for it, and at
    * stream start would put a NEGATIVE operand under the division, the
    * one case where truncating (Spark) and flooring (DuckDB //) div
    * disagree.
    */
  def manifest(offsets: DataFrame): DataFrame =
    offsets
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("seq_first", expr(s"start_off div $SeqLen"))
      .withColumn("seq_last",
        when(col("n_tokens") === 0, col("seq_first"))
          .otherwise(expr(s"(end_off - 1) div $SeqLen")))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_off"), col("seq_first"), col("seq_last"),
        when(col("n_tokens") === 0, 0L)
          .otherwise(col("seq_last") - col("seq_first") + 1).as("n_seqs"))

  /** Window-formulation twin of `endOffsets` — the spec baseline and the
    * shape the oracle SQL uses. Serializes each source through one task;
    * not the scale path.
    */
  def endOffsetsWindow(toks: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    toks.withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("end_off"))
  }

  // ------------------------------------------------------------ oracle SQL

  /** CTE chain ptoks → poffs: token counts + windowed prefix sums. */
  def offsetsSql: String =
    s"""ptoks AS (
       |  SELECT doc_id, source,
       |         len(regexp_extract_all(text, '${TextOps.TokenPattern}')) AS n_tokens
       |  FROM documents),
       |poffs AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (
       |           PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
       |  FROM ptoks)""".stripMargin
}
