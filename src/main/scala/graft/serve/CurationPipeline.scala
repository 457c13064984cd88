package graft.serve

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedDeque
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  *   3. near-dup guard, two layers:
  *      a. INTRA-BATCH: band keys self-collide within the batch — any doc
  *         band-colliding with a smaller-id doc of the same batch is
  *         rejected (`near_dup_batch`), regardless of that smaller doc's
  *         own fate (deterministic, stricter-never-looser). Without this,
  *         back-to-back near-dup posts — the common scrape pattern —
  *         would batch together and both pass;
  *      b. CORPUS: band keys probed against the persisted band index —
  *         any band hit rejects (`near_dup_corpus`);
  *   4. containment guard (INTRA-BATCH, over the near-dup SURVIVORS —
  *      the batch funnel's stage order): a survivor whose cool shingles
  *      are >=80% inside a LARGER surviving doc of the same batch is
  *      rejected (`contained_batch`) — the quote-inclusion shape the
  *      symmetric LSH guard misses at Jaccard ~0.2, and the common scrape
  *      burst (article + its excerpt posted together). Corpus-wide
  *      containment is deliberately NOT guarded here: it would need a
  *      persisted shingle-level inverted index (band rows cannot answer
  *      asymmetric overlap), so cross-batch excerpts are the batch
  *      funnel's d_containment stage's job — a documented bounded posture,
  *      stricter-never-looser within each batch;
  *   5. admitted docs EXTEND both indexes (hash + band rows appended), so
  *      later batches are guarded against earlier ones — true corpus
  *      extension, not a static snapshot.
  *
  * INDEX MEMBERSHIP IS SCAN-ONLY, NEVER SHUFFLE: the exact-dup corpus
  * check is `index ⋉ broadcast(batch hashes)` (left semi with the
  * micro-batch side broadcast), and the band probe broadcasts the batch's
  * band keys the same way. The corpus-sized side is read in place — no
  * distinct(), no HashAggregate, no Exchange over it, per batch
  * (PlanSpec asserts the shape). The direction matters: a batch-side-left
  * semi join would have to BUILD the index (broadcast or shuffle it);
  * putting the index on the left keeps it streaming through the join.
  *
  * INDEX LAYOUT + COMPACTION (`indexRoot`):
  *   hash_tail/   append-only (text_hash) parquet — one file set per
  *                admitting batch
  *   band_tail/   append-only (id, band, key) parquet
  *   gen_<v>/     a compacted generation: `hash/` (distinct hashes),
  *                `bands/` (partitioned by key slot `kp` — the
  *                `Dedup.writeBandIndexPruned` pruning layout, probed with
  *                partition pruning so a batch reads only its own key
  *                slots), and a `_COMMITTED` marker recording the written
  *                keyParts and the tail files the generation absorbed.
  * Readers resolve latest committed generation ∪ non-absorbed tail files
  * per batch; `compact()` folds gen + tail snapshot into gen_{v+1} and
  * retires the absorbed tail files with a one-generation grace window
  * (IdentityStream's generation-retire pattern: files a concurrent reader
  * may still hold are excluded from new reads immediately but deleted only
  * at the NEXT compaction). Appends racing a compaction land in new tail
  * files outside the snapshot and stay visible. Membership semantics make
  * the gen/tail overlap during the grace window harmless: both indexes are
  * probed for EXISTENCE (semi-join / band hit), so a row present in both a
  * generation and a not-yet-deleted tail file changes no decision.
  * `admitBatch` auto-compacts every `CompactEveryBatches` admitting
  * batches; serving cost per batch stays ∝ batch size between compactions
  * because tail probes are also broadcast-batch joins.
  *
  * Docs shorter than the shingle width (n=5 words) produce no band keys:
  * they pass the near-dup guards trivially but are still exact-dedup'd by
  * content hash — same contract as the batch funnel.
  */
object CurationPipeline {

  val ShingleN = 5
  val MaxDecisions = 200

  /** Auto-compaction cadence: every this-many admitting batches the tail
    * logs fold into a new pruned generation. Between compactions the tail
    * holds at most this many batches' rows, so the plain tail probe stays
    * micro-batch-scale while the corpus bulk lives in the pruned layout.
    */
  val CompactEveryBatches = 64

  /** Batch-size bound for the driver-local containment kernel: under it,
    * one shingle collect (the decision log already collects the batch);
    * over it, the distributed `containmentDrops` operator — the
    * connectedComponentsAdaptive small-case/fallback pattern.
    */
  val MaxLocalContainDocs = 20000

  private val HashSchema = "text_hash STRING"
  private val BandSchema = "id BIGINT, band INT, key STRING"

  final case class Decision(docId: Long, decision: String, reason: String,
                            charsRedacted: Long)

  /** Size of the live admitted-corpus priority sample served at
    * `GET /corpus/sample`.
    */
  val SampleK = 10
  private val SampleSalt = "corpus"

  /** Driver-side counters + a bounded recent-decision log for the REST
    * surface (the reference's in-memory stats pattern).
    */
  final class Stats {
    val received = new AtomicLong
    val admitted = new AtomicLong
    val rejectedExactBatch = new AtomicLong
    val rejectedExactCorpus = new AtomicLong
    val rejectedNearDupBatch = new AtomicLong
    val rejectedNearDup = new AtomicLong
    val rejectedContained = new AtomicLong
    val charsRedacted = new AtomicLong
    val batches = new AtomicLong
    val compactions = new AtomicLong
    private val decisions = new ConcurrentLinkedDeque[Decision]()

    def record(d: Decision): Unit = {
      d.decision match {
        case "admitted" => admitted.incrementAndGet()
        case _ => d.reason match {
          case "exact_dup_batch"  => rejectedExactBatch.incrementAndGet()
          case "exact_dup_corpus" => rejectedExactCorpus.incrementAndGet()
          case "near_dup_batch"   => rejectedNearDupBatch.incrementAndGet()
          case "near_dup_corpus"  => rejectedNearDup.incrementAndGet()
          case "contained_batch"  => rejectedContained.incrementAndGet()
        }
      }
      charsRedacted.addAndGet(d.charsRedacted)
      decisions.addFirst(d)
      while (decisions.size > MaxDecisions) decisions.pollLast()
      ()
    }

    def recent: Seq[Decision] = decisions.iterator().asScala.toSeq

    /** Live weight-proportional sample of the ADMITTED corpus: the shared
      * DLT sketch kernel (`operators.PrioritySketch` — the SAME code the
      * streaming twin folds, so parity with `CurationQueries
      * .prioritySample` cannot drift) with a single global key, weight =
      * admitted text length. K+1 entries — a k-bounded kernel exactly
      * like the decision log above, not corpus state. Durable: admitBatch
      * persists the candidates next to the dedup indexes and loadSample
      * restores them on attach, so the equals-the-batch-operator claim
      * survives a pipeline restart, same as the guard state.
      */
    private var sketch = graft.operators.PrioritySketch(SampleK, SampleSalt)

    def offerSample(docId: Long, nChars: Long): Unit = synchronized {
      sketch = sketch.offer(docId, nChars)
    }

    /** Full candidate set (K+1), for persistence. */
    def sampleCandidates: Vector[(Long, Long)] = synchronized {
      sketch.cands.map(t => (t._1, t._2))
    }

    def restoreSample(cands: Seq[(Long, Long)]): Unit = synchronized {
      sketch = cands.foldLeft(
        graft.operators.PrioritySketch(SampleK, SampleSalt)) {
        case (s, (id, w)) => s.offer(id, w)
      }
    }

    // Locale.ROOT: default-locale %.4f renders a decimal COMMA on e.g.
    // de_DE JVMs, which is malformed JSON
    private def f4(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

    def sampleJson: String = synchronized {
      val tau = sketch.tau
      val rows = sketch.sample.map { case (id, w, p) =>
        s"""{"docId":$id,"nChars":$w,"priority":${f4(p)},"wHat":${f4(math.max(w.toDouble, tau))}}"""
      }.mkString("[", ",", "]")
      s"""{"k":$SampleK,"tau":${f4(tau)},"sample":$rows}"""
    }

    def json: String = {
      val recentJson = recent.take(50).map { d =>
        s"""{"docId":${d.docId},"decision":"${d.decision}","reason":"${d.reason}","charsRedacted":${d.charsRedacted}}"""
      }.mkString("[", ",", "]")
      s"""{"received":${received.get},"admitted":${admitted.get},"rejected_exact_batch":${rejectedExactBatch.get},"rejected_exact_corpus":${rejectedExactCorpus.get},"rejected_near_dup_batch":${rejectedNearDupBatch.get},"rejected_near_dup":${rejectedNearDup.get},"rejected_contained_batch":${rejectedContained.get},"chars_redacted":${charsRedacted.get},"batches":${batches.get},"compactions":${compactions.get},"decisions":$recentJson}"""
    }
  }

  // ------------------------------------------------------------ index I/O

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data part files of a flat parquet append directory (no markers). */
  private def partFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("part-")).map(_.toString).sorted
  }

  /** Latest committed generation marker, parsed. The marker is written
    * LAST, so a half-written generation (crash mid-compaction) is invisible
    * — readers fall back to the previous generation + the full tail, which
    * is stricter-never-looser (nothing absorbed, nothing lost).
    */
  final case class Generation(version: Long, dir: String, keyParts: Int,
                              absorbedHash: Set[String], absorbedBand: Set[String])

  private val marker = new ObjectMapper()

  private def genDirs(spark: SparkSession, root: String): Seq[Path] = {
    val p = new Path(root)
    val f = fs(spark, root)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("gen_"))
  }

  def currentGeneration(spark: SparkSession, root: String): Option[Generation] = {
    val f = fs(spark, root)
    val committed = genDirs(spark, root)
      .filter(d => f.exists(new Path(d, "_COMMITTED")))
      .map(d => (d.getName.stripPrefix("gen_").toLong, d))
    committed.sortBy(-_._1).headOption.map { case (v, d) =>
      val in = f.open(new Path(d, "_COMMITTED"))
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val node = marker.readTree(body)
      def files(field: String): Set[String] =
        node.path(field).elements().asScala.map(_.asText).toSet
      Generation(v, d.toString, node.path("keyParts").asInt,
        files("absorbedHash"), files("absorbedBand"))
    }
  }

  private def emptyDf(spark: SparkSession, schemaDdl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(schemaDdl))

  /** Generation reads cached by directory: a committed generation is
    * IMMUTABLE, so its DataFrame (and the file/partition listing inside
    * its FileIndex) is reused across micro-batches instead of re-listing
    * every key-slot directory per batch — at production slot counts
    * (thousands of directories) per-batch re-discovery would dwarf the
    * pruned read itself. Superseded generations are evicted when a newer
    * one resolves for the same root.
    */
  private val genReads =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The cache key carries the owning SparkContext's identity: a pipeline
    * restarted in the same JVM (new session, same indexRoot) must NOT be
    * served a DataFrame whose plan and FileIndex belong to the STOPPED
    * context — every micro-batch would fail on 'stopped SparkContext'
    * until the next compaction happened to change the key. Touching a
    * root evicts both superseded generations and stale-session entries
    * for it.
    */
  private def cachedGenRead(spark: SparkSession, root: String, genDir: String,
                            kind: String, mk: => DataFrame): DataFrame = {
    val sess = System.identityHashCode(spark.sparkContext)
    genReads.keySet().removeIf(k =>
      k.startsWith(root + "|") && !k.startsWith(s"$root|$genDir|$sess|"))
    genReads.computeIfAbsent(s"$root|$genDir|$sess|$kind", _ => mk)
  }

  /** Read a set of tail part files with an EXPLICIT schema: an empty file
    * list and a _SUCCESS-only directory both yield an empty frame without
    * schema inference, while genuine read failures (corrupt file,
    * transient FS error) PROPAGATE and fail the micro-batch — the guard
    * must get stricter on failure, never looser.
    */
  private def readFiles(spark: SparkSession, files: Seq[String],
                        schemaDdl: String): DataFrame =
    if (files.isEmpty) emptyDf(spark, schemaDdl)
    else spark.read.schema(StructType.fromDDL(schemaDdl)).parquet(files: _*)

  /** Tail files not yet absorbed by the current generation. */
  private def liveTail(spark: SparkSession, dir: String,
                       absorbed: Set[String]): Seq[String] =
    partFiles(spark, dir).filterNot(absorbed.contains)

  /** The hash index visible to a batch: generation hashes ∪ live tail. */
  def hashIndex(spark: SparkSession, root: String): DataFrame =
    hashIndex(spark, root, currentGeneration(spark, root))

  /** Variant over a pre-resolved generation: admitBatch resolves the
    * (immutable) marker ONCE per micro-batch and feeds both probes —
    * resolving per probe doubled the gen-dir listing + marker read, fixed
    * driver-side FS RPC latency on every batch.
    */
  private[serve] def hashIndex(spark: SparkSession, root: String,
                               gen: Option[Generation]): DataFrame = {
    val tail = readFiles(spark,
      liveTail(spark, s"$root/hash_tail", gen.map(_.absorbedHash).getOrElse(Set.empty)),
      HashSchema)
    gen match {
      case Some(g) =>
        cachedGenRead(spark, root, g.dir, "hash",
          spark.read.schema(StructType.fromDDL(HashSchema))
            .parquet(s"${g.dir}/hash")).unionAll(tail)
      case None => tail
    }
  }

  /** Corpus exact-dup hits for a batch's content hashes:
    * `index ⋉ broadcast(batch hashes)` — a left-semi join with the
    * micro-batch side broadcast, so the corpus-sized index STREAMS through
    * the join (scan-only: no distinct, no HashAggregate, no Exchange over
    * it; CompactionSpec asserts the shape on the executed plan). Output is
    * ≤ batch-sized; the trailing distinct folds the grace-window gen/tail
    * overlap and costs one exchange of that tiny set.
    */
  def corpusHashHits(spark: SparkSession, root: String,
                     batchHashes: DataFrame): DataFrame =
    corpusHashHits(spark, root, batchHashes, currentGeneration(spark, root))

  private[serve] def corpusHashHits(spark: SparkSession, root: String,
                                    batchHashes: DataFrame,
                                    gen: Option[Generation]): DataFrame =
    hashIndex(spark, root, gen)
      .join(broadcast(batchHashes.distinct()), Seq("text_hash"), "left_semi")
      .distinct()

  /** Corpus band-collision hits for a batch's band keys: the pruned
    * generation probed with partition pruning (read volume ∝ the batch's
    * key slots) ∪ the plain tail probed with the batch broadcast. This is
    * THE production probe — CompactionSpec runs it directly and asserts
    * the generation scan's files from the executed plan.
    */
  def corpusBandHits(spark: SparkSession, root: String,
                     probeBands: DataFrame): DataFrame =
    corpusBandHits(spark, root, probeBands, currentGeneration(spark, root))

  private[serve] def corpusBandHits(spark: SparkSession, root: String,
                                    probeBands: DataFrame,
                                    gen: Option[Generation]): DataFrame = {
    val tailBands = readFiles(spark,
      liveTail(spark, s"$root/band_tail", gen.map(_.absorbedBand).getOrElse(Set.empty)),
      BandSchema)
    val tailHits = Dedup.candidatePairsAcross(tailBands, broadcast(probeBands))
    gen match {
      case Some(g) =>
        // the partition column kp arrives via directory discovery; the
        // written modulus comes from the commit marker, not metadata
        val genBands = cachedGenRead(spark, root, g.dir, "bands",
          spark.read
            .schema(StructType.fromDDL(s"$BandSchema, kp INT"))
            .option("basePath", s"${g.dir}/bands")
            .parquet(s"${g.dir}/bands"))
        Dedup.candidatePairsAcrossPruned(genBands, broadcast(probeBands), g.keyParts)
          .unionAll(tailHits)
      case None => tailHits
    }
  }

  /** Admit one micro-batch (columns doc_id, ts, text) through the full
    * funnel; records a Decision per doc and appends admitted docs' hash
    * and band rows to the tail logs. Auto-compacts every
    * `CompactEveryBatches` admitting batches.
    */
  def admitBatch(spark: SparkSession, batch: DataFrame,
                 indexRoot: String, stats: Stats): Unit = {
    if (batch.isEmpty) return
    // resolve the (immutable) committed-generation marker ONCE for both
    // probes below — per-probe resolution doubled the per-batch FS RPCs
    val gen = currentGeneration(spark, indexRoot)
    // 1. scrub (map-only). chars_redacted clamps at 0: a redaction token
    // longer than the matched PII ('a@b.co' -> '<EMAIL>') would otherwise
    // record a NEGATIVE delta and corrupt the cumulative counter.
    val scrubbed = batch
      .withColumn("redacted", PiiQueries.redactExpr(col("text")))
      .withColumn("chars_redacted",
        greatest(lit(0L),
          (length(col("text")) - length(col("redacted"))).cast("long")))
      .select(col("doc_id"), col("redacted").as("text"), col("chars_redacted"))
      .withColumn("text_hash", md5(col("text")))
      .localCheckpoint() // several consumers below; the batch is micro-sized
    // 2a. intra-batch exact: first arrival (min doc_id) per hash wins
    val keeper = scrubbed.groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("__keeper"))
    // 2b. corpus exact: index ⋉ broadcast(batch hashes) — the corpus side
    // is scanned in place (no distinct, no shuffle); output ≤ batch size
    val corpusHits = corpusHashHits(spark, indexRoot,
        scrubbed.select(col("text_hash")), gen)
      .withColumn("__in_corpus", lit(true))
    val flagged = scrubbed
      .join(keeper, "text_hash")
      .join(broadcast(corpusHits), Seq("text_hash"), "left")
      .select(col("doc_id"), col("text"), col("text_hash"), col("chars_redacted"),
        (col("doc_id") =!= col("__keeper")).as("batch_dup"),
        coalesce(col("__in_corpus"), lit(false)).as("corpus_dup"))
      .localCheckpoint()
    // 3. near-dup guards for exact survivors
    val survivors = flagged.filter(!col("batch_dup") && !col("corpus_dup"))
    val probeBands = Dedup.bandKeys(Dedup.minhashSignaturesRowwise(
      survivors, col("doc_id"), col("text"), ShingleN))
      .localCheckpoint() // probed three ways below; micro-batch-sized
    // 3a. intra-batch: a band collision with a SMALLER-id doc of the same
    // batch rejects the larger id (min-id-wins, deterministic; the smaller
    // doc's own corpus fate does not un-reject it — stricter, never looser)
    val intraHit = Dedup.candidatePairs(probeBands)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("__near_batch", lit(true))
    // 3b. corpus: any band hit against generation + tail indexes
    val nearHit = corpusBandHits(spark, indexRoot, probeBands, gen)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("__near", lit(true))
    // 3c. intra-batch containment: same contract as the batch funnel's
    // d_containment stage (hot cut relative to the BATCH — the df<=8
    // absolute floor is what carries the excerpt signal at micro-batch
    // sizes), and in the funnel's stage ORDER: over the near-dup
    // SURVIVORS. Running it before the band collapse would let a
    // one-word-longer near-dup pair lose BOTH members (the larger to the
    // band guard, the smaller to mutual containment) — after it, the
    // kept member of every near-dup pair is immune and only genuine
    // excerpt inclusions fall. The common case is the DRIVER-LOCAL kernel
    // (one codegen'd shingle collect — the batch is micro-sized and its
    // decision log is collected below anyway; the distributed operator's
    // ~10 AQE stage materializations tripled p50 batch latency for zero
    // data); a pathological oversized batch falls back to the distributed
    // operator, same contract, parity held by SamplingContainmentSpec.
    val nearSurvivors = survivors
      .join(broadcast(intraHit), Seq("doc_id"), "left")
      .join(broadcast(nearHit), Seq("doc_id"), "left")
      .filter(coalesce(col("__near_batch"), lit(false)) === false &&
        coalesce(col("__near"), lit(false)) === false)
    // one action decides size AND fetches: limit(bound+1) — a result
    // inside the bound is the whole batch, one row over proves oversize
    val collected = nearSurvivors.select(col("doc_id"),
        org.apache.spark.sql.graft.ArrayExpressions.shingleHashes(
          col("text"), ShingleN).as("hs"))
      .limit(MaxLocalContainDocs + 1).collect()
    val containedHit: DataFrame =
      if (collected.length <= MaxLocalContainDocs) {
        import spark.implicits._
        graft.queries.DedupQueries.containmentDropIdsLocal(
            collected.toSeq.map(r => (r.getLong(0), r.getSeq[Long](1))))
          .toSeq.toDF("doc_id")
          .withColumn("__contained", lit(true))
      } else
        graft.queries.DedupQueries.containmentDrops(
            nearSurvivors.select(col("doc_id").as("id"), col("text")))
          .select(col("id").as("doc_id"))
          .withColumn("__contained", lit(true))
    val decided = flagged
      .join(broadcast(intraHit), Seq("doc_id"), "left")
      .join(broadcast(nearHit), Seq("doc_id"), "left")
      .join(broadcast(containedHit), Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"), col("text_hash"), col("chars_redacted"),
        col("batch_dup"), col("corpus_dup"),
        coalesce(col("__near_batch"), lit(false)).as("near_dup_batch"),
        coalesce(col("__near"), lit(false)).as("near_dup"),
        coalesce(col("__contained"), lit(false)).as("contained_batch"))
      .localCheckpoint()
    // 4. extend the indexes with the admissions BEFORE recording decisions
    // (a crash between the two leaves the guard stricter, never looser)
    val admitted = decided.filter(!col("batch_dup") && !col("corpus_dup") &&
      !col("near_dup_batch") && !col("near_dup") && !col("contained_batch"))
    if (!admitted.isEmpty) {
      admitted.select(col("text_hash"))
        .write.mode("append").parquet(s"$indexRoot/hash_tail")
      // probeBands (already checkpointed) holds exactly the survivors'
      // band rows — recomputing shingles + minhash over admitted texts
      // would pay the dominant per-doc cost twice per batch
      val newBands = probeBands.join(
        broadcast(admitted.select(col("doc_id").as("id"))), Seq("id"), "left_semi")
      // all-short-doc batches produce no band rows; an empty append would
      // leave a schema-less directory behind
      if (!newBands.isEmpty) newBands.write.mode("append").parquet(s"$indexRoot/band_tail")
      if (stats.batches.incrementAndGet() % CompactEveryBatches == 0) {
        compact(spark, indexRoot)
        stats.compactions.incrementAndGet()
        ()
      }
    }
    var anyAdmitted = false
    decided.select(col("doc_id"), col("batch_dup"), col("corpus_dup"),
        col("near_dup_batch"), col("near_dup"), col("chars_redacted"),
        length(col("text")).cast("long").as("n_chars"), col("contained_batch"))
      .collect()
      .sortBy(_.getLong(0))
      .foreach { r =>
        val (id, cr) = (r.getLong(0), r.getLong(5))
        val d =
          if (r.getBoolean(1)) Decision(id, "rejected", "exact_dup_batch", cr)
          else if (r.getBoolean(2)) Decision(id, "rejected", "exact_dup_corpus", cr)
          else if (r.getBoolean(3)) Decision(id, "rejected", "near_dup_batch", cr)
          else if (r.getBoolean(4)) Decision(id, "rejected", "near_dup_corpus", cr)
          else if (r.getBoolean(7)) Decision(id, "rejected", "contained_batch", cr)
          else Decision(id, "admitted", "", cr)
        if (d.decision == "admitted") {
          stats.offerSample(id, r.getLong(6))
          anyAdmitted = true
        }
        stats.record(d)
      }
    if (anyAdmitted) persistSample(spark, indexRoot, stats)
  }

  /** Persist the serving sample's candidate set next to the dedup
    * indexes (tmp-write + rename), so `loadSample` on a restarted
    * pipeline restores the sketch and the served sample keeps equalling
    * the batch operator over ALL admissions — durability matching the
    * guard state's. K+1 rows, so the write is trivially small.
    */
  def persistSample(spark: SparkSession, root: String, stats: Stats): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/sample.json.tmp")
    val dst = new Path(s"$root/sample.json")
    val body = stats.sampleCandidates
      .map { case (id, w) => s"[$id,$w]" }
      .mkString("""{"cands":[""", ",", "]}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    f.delete(dst, false)
    f.rename(tmp, dst)
    ()
  }

  /** Restore the serving sample on pipeline attach. The sample is an
    * OBSERVABILITY surface, not a guard: a missing or unreadable file
    * restores an empty sketch (it refills from new admissions) instead of
    * failing the pipeline — unlike the index reads, where failure must
    * fail the batch.
    */
  def loadSample(spark: SparkSession, root: String, stats: Stats): Unit =
    scala.util.Try {
      val dst = new Path(s"$root/sample.json")
      val f = fs(spark, root)
      if (f.exists(dst)) {
        val in = f.open(dst)
        val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        val cands = marker.readTree(body).path("cands").elements().asScala
          .map(e => (e.get(0).asLong, e.get(1).asLong)).toSeq
        stats.restoreSample(cands)
      }
    }.getOrElse(())

  /** Startup compaction — the serve path's DEFAULT: fold any pre-existing
    * tail bulk into a key-slot-pruned generation BEFORE the first served
    * batch. A corpus bulk-seeded into the append tail (an offline
    * loader's natural output shape) would otherwise pay the O(corpus)
    * flat-tail probe on EVERY batch until the 64-batch auto-compaction
    * cadence first fires; measured at the 5M-doc corpus the pruned
    * generation wins p50 outright (INGEST_1000X: -17% p50, -21% p95,
    * -42% first batch), and corpus ≫ batch is the production regime. The
    * old lazy-tail start stays behind `SPARK_GRAFT_COMPACT_ON_START=0`
    * (it remains CORRECT either way — membership probes are
    * layout-independent, and IngestBench reports identical
    * admitted/rejected tallies for both layouts). No-op when the live
    * tail is empty: compacting then would only rewrite the current
    * generation.
    */
  def compactOnStart(spark: SparkSession, root: String): Option[Generation] = {
    if (sys.env.get("SPARK_GRAFT_COMPACT_ON_START").contains("0")) return None
    val gen = currentGeneration(spark, root)
    val live =
      liveTail(spark, s"$root/hash_tail",
        gen.map(_.absorbedHash).getOrElse(Set.empty)) ++
      liveTail(spark, s"$root/band_tail",
        gen.map(_.absorbedBand).getOrElse(Set.empty))
    if (live.isEmpty) gen else Some(compact(spark, root))
  }

  /** Compact the append logs into a new committed generation:
    * gen_{v+1} = current generation ∪ a snapshot of the live tail files,
    * hashes distinct'd, bands rewritten into the key-slot-partitioned
    * pruning layout. The marker commits LAST (readers never see a partial
    * generation); the absorbed tail files and the superseded generation
    * directory are excluded from reads immediately but PHYSICALLY deleted
    * only by the NEXT compaction (grace window for a reader that resolved
    * the old generation just before the commit). Safe to run concurrently
    * with appends: files appended after the snapshot stay live tail.
    */
  def compact(spark: SparkSession, root: String,
              keyParts: Int = Dedup.IndexKeyParts): Generation = {
    val f = fs(spark, root)
    val prev = currentGeneration(spark, root)

    // grace-window reclamation FIRST (single compacting writer — the
    // admitting thread): anything only a pre-`prev` reader could still
    // reference has had a full compaction interval of grace. Readers at
    // `prev` never touch these — prev's marker excludes its absorbed tail
    // files from liveTail, and older/uncommitted generation dirs are
    // invisible to resolution. Their CONTENT is already folded into prev's
    // data, so nothing is lost.
    prev.foreach { g =>
      (g.absorbedHash ++ g.absorbedBand).foreach(p => f.delete(new Path(p), false))
      genDirs(spark, root)
        .filter(d => d.toString != g.dir)
        .filter { d =>
          d.getName.stripPrefix("gen_").toLong < g.version ||
            !f.exists(new Path(d, "_COMMITTED")) // crashed half-compaction
        }
        .foreach(d => f.delete(d, true))
    }

    val nextVer = genDirs(spark, root)
      .map(_.getName.stripPrefix("gen_").toLong).foldLeft(-1L)(math.max) + 1L
    val dir = s"$root/gen_$nextVer"

    // snapshot of what this generation absorbs; prev's absorbed files are
    // gone from disk by now, so the new marker stays bounded (it lists one
    // compaction interval's worth of tail files, never the full history)
    val hashSnap = liveTail(spark, s"$root/hash_tail",
      prev.map(_.absorbedHash).getOrElse(Set.empty))
    val bandSnap = liveTail(spark, s"$root/band_tail",
      prev.map(_.absorbedBand).getOrElse(Set.empty))

    val allHashes = prev match {
      case Some(g) => spark.read.schema(StructType.fromDDL(HashSchema))
        .parquet(s"${g.dir}/hash").unionAll(readFiles(spark, hashSnap, HashSchema))
      case None => readFiles(spark, hashSnap, HashSchema)
    }
    // distinct belongs HERE, in the offline compaction, not the serving
    // path: the tail is unique by construction, but gen ∪ tail may overlap
    // within a grace window and a rewrite is the one place to fold it
    allHashes.distinct().write.mode("overwrite").parquet(s"$dir/hash")

    val allBands = prev match {
      case Some(g) => spark.read
        .schema(StructType.fromDDL(s"$BandSchema, kp INT"))
        .parquet(s"${g.dir}/bands")
        .select(col("id"), col("band"), col("key"))
        .unionAll(readFiles(spark, bandSnap, BandSchema))
      case None => readFiles(spark, bandSnap, BandSchema)
    }
    // repartition BY the partition column before partitionBy: without it
    // every shuffle partition writes into every kp directory — up to
    // shufflePartitions × keyParts tiny files, and the probe pays file-open
    // cost instead of the pruning win. With it each slot directory holds
    // one file per owning task (~1).
    allBands.distinct()
      .withColumn("kp", Dedup.keyPart(col("key"), keyParts))
      .repartition(col("kp"))
      .write.mode("overwrite").partitionBy("kp").parquet(s"$dir/bands")

    // commit marker LAST; the absorbed-file lists make the new generation
    // self-describing (a restarted process resolves them from disk). The
    // previous generation DIRECTORY stays on disk until the next
    // compaction's reclamation pass — a reader that resolved it just
    // before this commit keeps working through the grace window.
    val body = marker.createObjectNode()
    body.put("keyParts", keyParts)
    val ah = body.putArray("absorbedHash")
    hashSnap.sorted.foreach(ah.add)
    val ab = body.putArray("absorbedBand")
    bandSnap.sorted.foreach(ab.add)
    val out = f.create(new Path(s"$dir/_COMMITTED"), true)
    try out.write(marker.writeValueAsBytes(body)) finally out.close()
    Generation(nextVer, dir, keyParts, hashSnap.toSet, bandSnap.toSet)
  }
}

/** POST /corpus/ingest body handling: `{"docId":<long>,"text":"..."}` →
  * validated, stamped with arrival time, handed to the pipeline's source.
  * Driver-thread-local jackson, same as CdpIngest — one POST must not
  * cost a Spark job.
  */
final class CorpusIngest(sink: (Long, Timestamp, String) => Boolean,
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
    if (sink(idNode.asLong, new Timestamp(System.currentTimeMillis()), text)) {
      stats.received.incrementAndGet() // count only what was truly enqueued
      Right(idNode.asLong)
    } else Left(CdpIngest.Overloaded)
  }
}
