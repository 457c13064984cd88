package graft

/** MakeFunnel writes the funnel's materialized checkpoints: one parquet
  * dir per stage boundary in pipeline order, a manifest with resume
  * lineage, and monotone non-increasing survivor counts (each stage only
  * removes documents). Verify's staged gate consumes the same dumps.
  */
class MakeFunnelSpec extends SparkSpec {

  test("writeStages dumps the chain with a resume manifest") {
    spark.catalog.clearCache() // a prior suite's pins are not this test's
    val out = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val rows = MakeFunnel.writeStages(spark, "/root/testdata/sf0.001", out)
    assert(rows.map(_._1) === MakeFunnel.StageNames)
    val survivors = rows.init // last entry is the six-row report
    assert(rows.last._2 === 6L)
    // attrition: survivor stages never grow
    survivors.map(_._2).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"stage grew: $survivors")
    }
    survivors.foreach { case (n, r) =>
      assert(r > 0, s"$n is empty")
      assert(new java.io.File(s"$out/$n").isDirectory)
    }
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/manifest.json"))
    MakeFunnel.StageNames.foreach(n => assert(manifest.contains(s""""$n"""")))
    assert(manifest.contains(""""resumes_from": "documents""""))
    assert(manifest.contains(""""resumes_from": "q_funnel_stage_span""""))
    // managed lifetime: writeStages released the shared stage leaves
    assert(spark.sharedState.cacheManager.isEmpty,
      "writeStages left pinned Dataset caches behind")
  }

  test("resume from the span dump recomputes only the edited tail") {
    spark.catalog.clearCache()
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-funnel-res").toString
    MakeFunnel.writeStages(spark, dir, out)
    val before = MakeFunnel.StageNames.init.map { n =>
      n -> spark.read.parquet(s"$out/$n").count() }.toMap

    // edit the quality cutoff and resume from the span boundary: the
    // dedup/LSH/containment/span machinery must not re-run — upstream
    // stages come back flagged resumed, downstream recomputed
    val res = MakeFunnel.resumeStages(spark, dir, out,
      "q_funnel_stage_span", qualityCutoff = 0.65)
    val (resumed, recomputed) = res.partition(_._3)
    assert(resumed.map(_._1) === MakeFunnel.StageNames.take(4))
    assert(recomputed.map(_._1) ===
      Seq("q_funnel_stage_quality", "q_curation_funnel"))
    // upstream dumps untouched
    MakeFunnel.StageNames.take(4).foreach { n =>
      assert(spark.read.parquet(s"$out/$n").count() === before(n)) }
    // a stricter cutoff keeps fewer docs than the 0.5 run
    val qualRows = spark.read.parquet(s"$out/q_funnel_stage_quality")
    assert(qualRows.count() < before("q_funnel_stage_quality"))

    // the resumed tail hash-matches a from-scratch run at the same cutoff
    val scratch = new graft.queries.CurationQueries.FunnelStages(
      spark, Tables.documents(spark, dir), qualityCutoff = 0.65)
    try {
      val wantQual = scratch.qual.collect().map(_.toString).sorted
      assert(qualRows.collect().map(_.toString).sorted === wantQual)
      val wantReport = graft.queries.CurationQueries.funnelReport(scratch)
        .collect().map(_.toString).sorted
      val gotReport = spark.read.parquet(s"$out/q_curation_funnel")
        .collect().map(_.toString).sorted
      assert(gotReport === wantReport)
    } finally scratch.close()
    // the rewritten manifest tracks the recomputed tail's row count
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/manifest.json"))
    assert(manifest.contains(s""""rows": ${qualRows.count()}"""))
  }
}
