package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

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
    val manifest = written.zipWithIndex.map { case ((name, rows, schema), i) =>
      val dep = if (i == 0) "\"documents\""
        else if (name == "q_curation_funnel")
          written.init.map(w => "\"" + w._1 + "\"").mkString("[", ",", "]")
        else "\"" + written(i - 1)._1 + "\""
      s"""  {"stage": "$name", "path": "$name", "rows": $rows,
         |   "schema": "$schema", "resumes_from": $dep}""".stripMargin
    }.mkString("[\n", ",\n", "\n]")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    written.map(w => (w._1, w._2))
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.batch("graft-make-funnel", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = writeStages(spark, sfDir, outDir)
    val dt = (System.nanoTime() - t0) / 1e9
    rows.foreach { case (n, r) => println(f"$n%-32s $r%10d rows") }
    println(f"funnel checkpoints written to $outDir in $dt%.1f s")
    spark.stop()
  }
}
