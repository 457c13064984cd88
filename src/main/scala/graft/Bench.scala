package graft

/** Bench main: runs every registered query on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line `{"metric":"total","value":N,"unit":"sec","queries":{...}}`.
  * A query that throws is recorded as `"<name>":"error"` (not a fake fast
  * timing) and the process exits non-zero so crashes can't masquerade as
  * wins in the bench artifact.
  *
  * Methodology (two fidelity rules, both learned the hard way):
  *   - Materialize via the `noop` sink, not `count()`. Timing `count()` lets
  *     Catalyst column-prune away expensive final projections that don't
  *     affect row count (e.g. per-element quantization math), so the bench
  *     under-measures projection-heavy queries. `noop` evaluates every output
  *     column and discards rows executor-side — no driver collect.
  *   - Report the per-query MEDIAN of SPARK_GRAFT_BENCH_RUNS runs
  *     (default 3). Single-run timings on a shared box vary ±2× with load;
  *     medians are the only per-query number stable enough to compare across
  *     rounds.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // optional args: substring filters — bench only matching queries
    val filters = args.toSeq
    val spark = Sessions.batch("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/parquet/shuffle paths so the first query's timing
    // reflects the query, not session initialization or JIT: aggregation,
    // parquet scan, md5 hashing, window functions, explode — the hot
    // expression paths the query set compiles
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
    // nh must stay load-bearing (count("nh"), not count(*)): otherwise
    // column pruning removes the window + md5 and the warm-up warms nothing
    spark.range(100000)
      .selectExpr("id % 97 AS k", "md5(CAST(id AS STRING)) AS h",
        "explode(sequence(0, 2)) AS e")
      .selectExpr("k", "h", "e",
        "lead(h, 1) OVER (PARTITION BY k ORDER BY e, h) AS nh")
      .groupBy("k").agg(org.apache.spark.sql.functions.count("nh")).collect()
    // localCheckpoint + broadcast-join machinery (first CC/kernel query
    // otherwise pays their one-time init)
    val warmCk = spark.range(1000).toDF("src").localCheckpoint(true)
    warmCk.join(org.apache.spark.sql.functions.broadcast(
      spark.range(10).toDF("src")), "src").count()
    // warm the noop-sink write path (DataSource V2 lookup + commit protocol)
    spark.range(1000).write.format("noop").mode("overwrite").save()
    var failed = 0
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) =>
          filters.isEmpty || filters.exists(name.contains)
        }
        .map { case (name, fn) =>
        val r =
          try {
            val times = (1 to runs).map { _ =>
              val t0 = System.nanoTime()
              // full materialization: every output column is computed
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              spark.catalog.clearCache() // no cross-run/query cache pinning
              dt
            }
            Right(median(times))
          }
          catch { case e: Throwable =>
            failed += 1
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            spark.catalog.clearCache()
            Left("error")
          }
        name -> r
      }
    val qs = results.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(_))  => s""""$k":"error""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
