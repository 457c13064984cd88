package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Materialized curation checkpoints: write every funnel stage boundary
  * (the q_funnel_stage_* dump schemas) plus the six-row attrition report
  * to parquet, with a manifest.json describing the chain. These are the
  * checkpoints a real training-data pipeline RESUMES from — re-running
  * only the stages downstream of a changed filter instead of the whole
  * funnel — and exactly the dumps the staged correctness gate
  * (tools/check.py --staged) verifies inductively. All six relations come
  * off ONE shared FunnelStages instance (CurationQueries.stagesFor), so
  * the pass costs one prefix computation, not six.
  *
  * Usage: runMain graft.MakeFunnel <sfDir> <outDir>
  * Output: outDir/<stage>/(parquet), outDir/manifest.json.
  * Dump schemas (documented in USAGE.md): survivor stages carry
  * (id BIGINT, n_words BIGINT); post-span stages carry
  * (id BIGINT, n_kept_tokens BIGINT); the report carries
  * (stage STRING, n_docs BIGINT, total_tokens BIGINT).
  */
object MakeFunnel {

  /** The funnel chain in pipeline order: dump name → registered query. */
  val StageNames: Seq[String] = Seq(
    "q_funnel_stage_dedup",
    "q_funnel_stage_neardup",
    "q_funnel_stage_containment",
    "q_funnel_stage_span",
    "q_funnel_stage_quality",
    "q_curation_funnel")

  /** Write all six relations + manifest; returns (name, rows) per stage.
    * Releases the shared stage leaves before returning (managed lifetime).
    */
  def writeStages(spark: SparkSession, sfDir: String,
                  outDir: String): Seq[(String, Long)] = {
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    val written =
      try StageNames.map { name =>
        val df = qs(name)(spark, sfDir)
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        val schema = df.schema.toDDL
        (name, rows, schema)
      // scoped release (r16 ADVICE): close ONLY this (session, dir)'s
      // shared stages — an embedding JVM with other live stage sets keeps
      // its pinned caches
      } finally graft.queries.CurationQueries.releaseStages(spark, sfDir)
    writeManifest(outDir, written)
    written.map(w => (w._1, w._2))
  }

  /** The chain manifest: rows, schema DDL, and `resumes_from` lineage per
    * stage (resumeStages consumes the lineage; the staged correctness
    * gate verifies the same dumps).
    */
  private def writeManifest(outDir: String,
                            written: Seq[(String, Long, String)]): Unit = {
    val manifest = written.zipWithIndex.map { case ((name, rows, schema), i) =>
      val dep = if (i == 0) "\"documents\""
        else if (name == "q_curation_funnel")
          written.init.map(w => "\"" + w._1 + "\"").mkString("[", ",", "]")
        else "\"" + written(i - 1)._1 + "\""
      s"""  {"stage": "$name", "path": "$name", "rows": $rows,
         |   "schema": "$schema", "resumes_from": $dep}""".stripMargin
    }.mkString("[\n", ",\n", "\n]")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    ()
  }

  /** Stage name → FunnelStages resume-boundary key. */
  private val BoundaryKeys: Map[String, String] = Map(
    "q_funnel_stage_dedup" -> "dedup",
    "q_funnel_stage_neardup" -> "neardup",
    "q_funnel_stage_containment" -> "containment",
    "q_funnel_stage_span" -> "span",
    "q_funnel_stage_quality" -> "quality")

  /** RESUME the funnel from an existing checkpoint dir: every stage up to
    * and including `fromStage` is loaded from its dump (the manifest's
    * `resumes_from` lineage, now actually consumed), and only the stages
    * DOWNSTREAM of it recompute — under `qualityCutoff`, which is the
    * edit that makes resuming worth it (re-score quality without re-paying
    * dedup/LSH/containment/span). Downstream dumps and the report are
    * overwritten in place; upstream dumps are read, never rewritten. The
    * recomputed tail is byte-equivalent to a from-scratch run at the same
    * cutoff (MakeFunnelSpec holds them hash-equal), because a resumed
    * text-carrying boundary is corpus ⋈ dump ids — the staged oracle's own
    * trust pattern. Returns (name, rows, resumed?) per stage.
    */
  def resumeStages(spark: SparkSession, sfDir: String, outDir: String,
                   fromStage: String,
                   qualityCutoff: Double = 0.5): Seq[(String, Long, Boolean)] = {
    val idx = StageNames.indexOf(fromStage)
    require(idx >= 0 && fromStage != "q_curation_funnel",
      s"fromStage must be a stage dump name, got $fromStage")
    val upstream = StageNames.take(idx + 1)
    val missing = upstream.filterNot(n => new java.io.File(s"$outDir/$n").isDirectory)
    require(missing.isEmpty, s"cannot resume from $fromStage: missing dumps ${missing.mkString(",")}")
    val resume = upstream.map { n =>
      BoundaryKeys(n) -> spark.read.parquet(s"$outDir/$n")
    }.toMap
    val st = new graft.queries.CurationQueries.FunnelStages(
      spark, Tables.documents(spark, sfDir), qualityCutoff, resume)
    val outputs: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "q_funnel_stage_dedup" -> st.deduped.select(col("id"), col("n_words")),
      "q_funnel_stage_neardup" -> st.surv2.select(col("id"), col("n_words")),
      "q_funnel_stage_containment" ->
        st.surv2c.select(col("id"), col("n_words")),
      "q_funnel_stage_span" -> st.surv3,
      "q_funnel_stage_quality" -> st.qual,
      "q_curation_funnel" -> graft.queries.CurationQueries.funnelReport(st))
    val written =
      try StageNames.zipWithIndex.map { case (name, i) =>
        if (i > idx)
          outputs(name).write.mode("overwrite").parquet(s"$outDir/$name")
        val back = spark.read.parquet(s"$outDir/$name")
        (name, back.count(), back.schema.toDDL, i <= idx)
      } finally st.close()
    // the manifest must track the recomputed tail (a changed cutoff
    // changes the quality stage's rows), so rewrite it wholesale from
    // the dumps now on disk
    writeManifest(outDir, written.map(w => (w._1, w._2, w._3)))
    written.map(w => (w._1, w._2, w._4))
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    // --resume <stageName> [--quality-cutoff X]: recompute only the
    // stages downstream of an existing dump (see resumeStages)
    val rest = args.drop(2)
    val resumeFrom = rest.sliding(2).collectFirst {
      case Array("--resume", v) => v }
    val cutoff = rest.sliding(2).collectFirst {
      case Array("--quality-cutoff", v) => v.toDouble }.getOrElse(0.5)
    val spark = Sessions.batch("graft-make-funnel", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    resumeFrom match {
      case Some(stage) =>
        val rows = resumeStages(spark, sfDir, outDir, stage, cutoff)
        val dt = (System.nanoTime() - t0) / 1e9
        rows.foreach { case (n, r, resumed) =>
          println(f"$n%-32s $r%10d rows ${if (resumed) "(resumed)" else "(recomputed)"}") }
        println(f"funnel tail recomputed from $stage in $dt%.1f s (quality cutoff $cutoff)")
      case None =>
        val rows = writeStages(spark, sfDir, outDir)
        val dt = (System.nanoTime() - t0) / 1e9
        rows.foreach { case (n, r) => println(f"$n%-32s $r%10d rows") }
        println(f"funnel checkpoints written to $outDir in $dt%.1f s")
    }
    spark.stop()
  }
}
