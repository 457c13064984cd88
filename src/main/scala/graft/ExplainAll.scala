package graft

/** Batch plan dump: `runMain graft.ExplainAll <outDir> <suffix> <name>...`
  * writes `<outDir>/<name>_<suffix>.txt` with the formatted physical plan of
  * each named registered query — one JVM/session for the whole list (Explain
  * pays ~20 s of sbt+session spin-up per query, which makes before/after
  * plan capture across dozens of queries impractical). Plans only; nothing
  * is executed (iterative operators still run their eager driver jobs while
  * the DataFrame is built, exactly as in Explain).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.batch("graft-explain-all", 8)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        val exchanges = "Exchange".r.findAllIn(plan).length
        System.err.println(s"[explainall] $name: ${plan.length} chars, " +
          s"$exchanges Exchange")
      } catch { case e: Throwable =>
        System.err.println(s"[explainall] $name FAILED: ${e.getMessage}")
      } finally {
        try { spark.catalog.clearCache() } catch { case _: Throwable => () }
        try { graft.queries.CurationQueries.releaseStages() }
        catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
