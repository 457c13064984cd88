package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The corpus-index compaction contract (CurationPipeline.compact):
  *  1. admit decisions are IDENTICAL against a compacted index and an
  *     uncompacted control — compaction is a pure layout change;
  *  2. the compacted generation is probed with partition pruning: the
  *     production probe's own executed plan reads no more key-slot
  *     partitions than the batch's band keys hash into;
  *  3. the exact-dup membership join streams the corpus index through a
  *     broadcast LEFT SEMI with NO Exchange/HashAggregate on the index
  *     side (the serving path must scan the index, never shuffle it);
  *  4. generation-retire reclamation: a second/third compaction deletes
  *     superseded generation dirs and absorbed tail files after a
  *     one-generation grace window, and the guards keep working from the
  *     generation alone.
  */
class CompactionSpec extends SparkSpec {

  private def batchDf(docs: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text").withColumn("ts", current_timestamp())
  }

  private def decisionsOf(stats: CurationPipeline.Stats,
                          ids: Set[Long]): Map[Long, (String, String)] =
    stats.recent.filter(d => ids.contains(d.docId))
      .map(d => d.docId -> (d.decision, d.reason)).toMap

  test("compaction preserves decisions, prunes probes, reclaims with grace") {
    val root1 = java.nio.file.Files.createTempDirectory("graft_compact1").toString
    val root2 = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    val s1 = new CurationPipeline.Stats
    val s2 = new CurationPipeline.Stats

    // every word carries the doc number: docs share NO shingles with each
    // other (the intra-batch near-dup guard would otherwise reject them)
    def corpusText(i: Long) =
      (0 until 14).map(w => s"w${i}x$w").mkString(s"corpus entry $i ", " ", "")
    val batchA = (1L to 6L).map(i => (i, corpusText(i)))
    val batchB = (7L to 12L).map(i => (i, corpusText(i)))
    for ((root, stats) <- Seq(root1 -> s1, root2 -> s2)) {
      CurationPipeline.admitBatch(spark, batchDf(batchA), root, stats)
      CurationPipeline.admitBatch(spark, batchDf(batchB), root, stats)
    }
    assert(s1.admitted.get == 12 && s2.admitted.get == 12)

    // ---- compact root1 only; root2 stays the uncompacted control
    val gen0 = CurationPipeline.compact(spark, root1)
    assert(CurationPipeline.currentGeneration(spark, root1)
      .exists(_.version == gen0.version))
    // the generation absorbed the whole tail: nothing live left
    assert(new java.io.File(s"${gen0.dir}/bands").listFiles()
      .exists(_.getName.startsWith("kp=")), "pruned layout missing kp= dirs")

    // ---- mixed probe batch: every decision class, against both layouts
    val fresh = "an entirely novel submission concerning tidal measurement " +
      "apparatus calibration across coastal stations in winter"
    val probe = Seq(
      101L -> corpusText(3),             // exact_dup_corpus
      102L -> (corpusText(7) + " appended"), // near_dup_corpus
      103L -> fresh,                     // admitted
      104L -> fresh,                     // exact_dup_batch (dup of 103)
      105L -> (fresh + " extra"),        // near_dup_batch (collides with 103)
      106L -> "tiny doc")                // admitted (short: no band keys)
    for ((root, stats) <- Seq(root1 -> s1, root2 -> s2))
      CurationPipeline.admitBatch(spark, batchDf(probe.map(p => (p._1, p._2))),
        root, stats)
    val ids = probe.map(_._1).toSet
    val d1 = decisionsOf(s1, ids)
    val d2 = decisionsOf(s2, ids)
    assert(d1 == d2, s"compacted vs control decisions differ:\n$d1\n$d2")
    assert(d1(101L) == ("rejected", "exact_dup_corpus"), d1)
    assert(d1(102L) == ("rejected", "near_dup_corpus"), d1)
    assert(d1(103L) == ("admitted", ""), d1)
    assert(d1(104L) == ("rejected", "exact_dup_batch"), d1)
    assert(d1(105L) == ("rejected", "near_dup_batch"), d1)
    assert(d1(106L) == ("admitted", ""), d1)

    // ---- 2: the production band probe prunes the generation scan to the
    // probe's key slots (AQE off so the scan node is directly observable)
    val probeBands = Dedup.bandKeys(Dedup.minhashSignaturesRowwise(
      batchDf(Seq(900L -> (corpusText(5) + " trailer"))),
      col("doc_id"), col("text"), CurationPipeline.ShingleN)).cache()
    val slots = probeBands
      .select(Dedup.keyPart(col("key"), gen0.keyParts).as("kp"))
      .distinct().collect().map(_.getInt(0)).toSet
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hits = CurationPipeline.corpusBandHits(spark, root1, probeBands)
      // execute hits ITSELF so its executedPlan's scan metrics populate
      assert(hits.collect().map(_.getAs[Long]("b")).toSet == Set(900L),
        "probe should band-hit its corpus near-original")
      val scans = hits.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("gen_")) => f
      }
      assert(scans.nonEmpty, "no scan over the compacted generation")
      val partsRead = scans.map(_.metrics("numPartitions").value).sum
      assert(partsRead > 0 && partsRead <= slots.size,
        s"generation probe read $partsRead partitions for ${slots.size} probed slots")

      // ---- 3: exact-dup membership = broadcast LEFT SEMI streaming the
      // index side — no Exchange/HashAggregate anywhere under the join's
      // streamed (index) subtree
      val memb = CurationPipeline.corpusHashHits(spark, root1,
        batchDf(Seq(901L -> corpusText(4))).select(md5(col("text")).as("text_hash")))
      assert(memb.count() == 1, "hash of a corpus text must hit")
      val bhj = memb.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType.toString == "LeftSemi" => j
      }
      assert(bhj.nonEmpty,
        s"expected broadcast left-semi membership join:\n${memb.queryExecution.executedPlan}")
      val indexSide = bhj.get.left
      assert(indexSide.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, s"index side of the membership join shuffles:\n$indexSide")
      assert(indexSide.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.isEmpty, s"index side of the membership join aggregates:\n$indexSide")
      assert(indexSide.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.nonEmpty, "index scan missing from the membership join's streamed side")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    // ---- 4: generation-retire reclamation across two more compactions.
    // gen1 absorbs the probe batch's tail; gen0 survives one grace window
    // and is deleted by the compaction AFTER that, as are gen1's absorbed
    // tail files.
    val gen1 = CurationPipeline.compact(spark, root1)
    assert(gen1.version > gen0.version)
    assert(new java.io.File(gen0.dir).exists(),
      "superseded generation must survive one grace window")
    assert(gen1.absorbedHash.nonEmpty, "gen1 should absorb the probe batch's tail")
    val gen2 = CurationPipeline.compact(spark, root1)
    assert(!new java.io.File(gen0.dir).exists(),
      "two-generations-old dir must be reclaimed")
    assert(gen1.absorbedHash.forall(p =>
      !new java.io.File(p.stripPrefix("file:")).exists()),
      "tail files absorbed by the previous generation must be reclaimed")
    assert(gen2.absorbedHash.isEmpty, "nothing new to absorb")

    // all guard state now lives in the generation alone (tail empty):
    // near-dup of an earlier ADMISSION and exact dup of corpus still reject
    val post = Seq(
      201L -> (fresh + " coda"),   // near-dup of admitted doc 103
      202L -> corpusText(9),       // exact corpus dup
      203L -> ("final genuinely distinct content about volcanic ash " +
        "dispersal models compared over multiple eruption seasons"))
    CurationPipeline.admitBatch(spark, batchDf(post.map(p => (p._1, p._2))),
      root1, s1)
    val dPost = decisionsOf(s1, post.map(_._1).toSet)
    assert(dPost(201L) == ("rejected", "near_dup_corpus"), dPost)
    assert(dPost(202L) == ("rejected", "exact_dup_corpus"), dPost)
    assert(dPost(203L) == ("admitted", ""), dPost)
  }

  test("compactOnStart folds a bulk-seeded tail, no-ops when tail is empty") {
    val root = java.nio.file.Files.createTempDirectory("graft_cos").toString
    def corpusText(i: Long) =
      (0 until 14).map(w => s"c${i}y$w").mkString(s"seeded entry $i ", " ", "")
    val seed = (1L to 8L).map(i => (i, corpusText(i)))
    val stats = new CurationPipeline.Stats
    CurationPipeline.admitBatch(spark, batchDf(seed), root, stats)
    assert(CurationPipeline.currentGeneration(spark, root).isEmpty,
      "seed admissions should land in the tail, not a generation")

    // the serve-path default: startup folds the tail into a generation
    val gen = CurationPipeline.compactOnStart(spark, root)
    assert(gen.nonEmpty, "compactOnStart left a bulk-seeded tail unfolded")
    assert(CurationPipeline.currentGeneration(spark, root)
      .exists(_.version == gen.get.version))

    // idempotent when nothing new arrived: same generation, no rewrite
    val again = CurationPipeline.compactOnStart(spark, root)
    assert(again.map(_.version) === gen.map(_.version),
      "compactOnStart with an empty live tail must not rewrite the generation")

    // decisions against the startup-compacted index match the tail
    // semantics: a corpus dup rejects, fresh admits
    val s2 = new CurationPipeline.Stats
    CurationPipeline.admitBatch(spark,
      batchDf(Seq((301L, corpusText(3)), (302L, corpusText(300)))), root, s2)
    val d = decisionsOf(s2, Set(301L, 302L))
    assert(d(301L)._1 == "rejected", d)
    assert(d(302L) == ("admitted", ""), d)
  }
}
