package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The cell-partitioned index layout claim (Ivf.scala): probing must read
  * ONLY the probed cells' files. Guard: the pruned read's scan metrics
  * show fewer files than the full index, exactly the probed partitions —
  * and search results through the pruned candidates are identical to the
  * full-assignment path.
  */
class IvfPruningSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      m <- 0 until 20
    } yield {
      val v = Array.fill(8)(0.0)
      v(2 * c) = 1.0
      v(2 * c + 1) = 0.01 * (m % 5)
      (m.toLong * 3 + c, v.toSeq)
    }
    rows.toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
  }

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // materialize so the scan metrics are populated
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f.metrics("numFiles").value }
      .getOrElse(fail("no FileSourceScanExec in plan"))
  }

  test("probe join over the by-cell layout reads only probed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    val prep = corpus.cache()
    val cents = Ivf.centroids(prep, k = 3).cache()
    Ivf.writeAssignedByCell(Ivf.assign(prep, cents), dir)

    val queries = prep.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q"), col("e").as("qe"), col("nrm").as("qn"))
    val probed = Ivf.probe(queries, cents, nProbe = 1).cache()
    val cells = probed.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq // bounded by K: it is a centroid-id set
    assert(cells.nonEmpty && cells.size < 3, s"probe should hit a strict subset: $cells")

    val full = spark.read.parquet(dir).withColumn("cid", col("cid").cast("long"))
    val pruned = Ivf.readAssignedCells(spark, dir, cells)
    val fullFiles = scanFiles(full)
    val prunedFiles = scanFiles(pruned)
    assert(prunedFiles < fullFiles,
      s"pruned read touched $prunedFiles of $fullFiles files — no file-level pruning")
    // the pruned scan's rows are exactly the probed cells' population
    assert(pruned.select("cid").distinct().collect().map(_.getLong(0)).toSet == cells.toSet)

    // and the ranked results are identical to the full-assignment path
    val viaFull = Ivf.searchRank(probed, prep, full, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaPruned = Ivf.searchRank(probed, prep, pruned, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaFull == viaPruned && viaFull.nonEmpty)
  }
}
