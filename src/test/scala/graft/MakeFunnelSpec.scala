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
}
