package graft

/** Bench main: runs every registered query on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line `{"metric":"total","value":N,"unit":"sec","queries":{...}}`.
  * A query that throws is recorded as `"<name>":"error"` (not a fake fast
  * timing) and the process exits non-zero so crashes can't masquerade as
  * wins in the bench artifact.
  *
  * Methodology (three fidelity rules, all learned the hard way):
  *   - Materialize via the `noop` sink, not `count()`. Timing `count()` lets
  *     Catalyst column-prune away expensive final projections that don't
  *     affect row count (e.g. per-element quantization math), so the bench
  *     under-measures projection-heavy queries. `noop` evaluates every output
  *     column and discards rows executor-side — no driver collect.
  *   - Report the per-query MEDIAN of SPARK_GRAFT_BENCH_RUNS runs
  *     (default 3). Single-run timings on a shared box vary ±2× with load;
  *     medians are the only per-query number stable enough to compare across
  *     rounds.
  *   - The artifact must be SELF-EVIDENCING against sustained box load.
  *     Round-5 lesson: a load window spanning all 3 runs of a query inflated
  *     its median ~95× (79.9 s reported vs 0.84 s idle) and the artifact
  *     carried nothing that let a reader tell inflation from regression.
  *     Now every query reports {median, min, spread} and a fixed CALIBRATION
  *     SENTINEL (a constant-cost local query that never touches disk) is
  *     re-timed at start and every SENTINEL_EVERY queries. A sentinel sample
  *     that drifts ≥2× above the session-best sentinel marks the whole block
  *     `load_suspect:true`; a query whose MEDIAN sits ≥1.5× above its own
  *     min is also suspect (median/min, not max/min — run 1 always pays
  *     that query's codegen compile, which the median absorbs but the max
  *     would flag on every query). How to read the artifact:
  *       - `queries` (name → median) is unchanged — round-over-round compare.
  *       - `queries_detail[name].min` is the load-floor: the best this code
  *         did THIS session. A median far above its own min = transient load,
  *         not code. Compare `min` across rounds when `load_suspect` is true.
  *       - `sentinel.series` is the drift log; `load_suspect_count` > 0 means
  *         treat inflated medians as unproven, re-bench idle before judging.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Fixed-cost calibration probe: pure-compute aggregation over a local
    * range — no disk, no shuffle variance, ~100 ms idle. Its only variable is
    * box load, so drift in its timing is direct evidence of contention.
    */
  private def sentinelOnce(spark: org.apache.spark.sql.SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(4000000)
      .selectExpr("id % 1024 AS k", "md5(CAST(id AS STRING)) AS h")
      .groupBy("k").agg(org.apache.spark.sql.functions.max("h"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val sentinelEvery =
      sys.env.getOrElse("SPARK_GRAFT_SENTINEL_EVERY", "10").toInt.max(1)
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

    // calibration baseline: best of 3 at session start (the warm floor)
    sentinelOnce(spark) // discard first (JIT)
    var sentinelBest = (1 to 3).map(_ => sentinelOnce(spark)).min
    val sentinelSeries = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    sentinelSeries += ((0, sentinelBest))
    var blockLoaded = false // sentinel verdict for the current query block

    final case class QStat(median: Double, min: Double, spread: Double,
                           loadSuspect: Boolean)
    var failed = 0
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        filters.isEmpty || filters.exists(name.contains)
      }
    val results: Seq[(String, Either[String, QStat])] =
      selected.zipWithIndex.map { case ((name, fn), idx) =>
        if (idx % sentinelEvery == 0 && idx > 0) {
          val s = sentinelOnce(spark)
          sentinelSeries += ((idx, s))
          sentinelBest = sentinelBest.min(s)
          blockLoaded = s >= 2.0 * sentinelBest
        }
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
            val mn = times.min
            val med = median(times)
            val spread = if (mn > 0) times.max / mn else 1.0
            // suspect when the MEDIAN sits far above the query's own min —
            // max/min would cry wolf on every query (run 1 always pays
            // that query's codegen compile; the median absorbs it)
            Right(QStat(med, mn, spread,
              loadSuspect = blockLoaded || (mn > 0 && med / mn >= 1.5)))
          }
          catch { case e: Throwable =>
            failed += 1
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            spark.catalog.clearCache()
            Left("error")
          }
        name -> r
      }
    // closing sentinel sample — evidence for the tail block
    val sClose = sentinelOnce(spark)
    sentinelSeries += ((selected.size, sClose))
    sentinelBest = sentinelBest.min(sClose)

    def f(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map {
      case (k, Right(v)) => s""""$k":${f(v.median)}"""
      case (k, Left(_))  => s""""$k":"error""""
    }.mkString("{", ",", "}")
    val detail = results.map {
      case (k, Right(v)) =>
        s""""$k":{"median":${f(v.median)},"min":${f(v.min)},"spread":${f(v.spread)},"load_suspect":${v.loadSuspect}}"""
      case (k, Left(_)) => s""""$k":{"error":true}"""
    }.mkString("{", ",", "}")
    val sentinelJson = sentinelSeries
      .map { case (i, s) => s"""{"at_query":$i,"sec":${f(s)}}""" }
      .mkString("[", ",", "]")
    val suspects = results.collect { case (_, Right(v)) if v.loadSuspect => 1 }.size
    val total = results.collect { case (_, Right(v)) => v.median }.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"queries_detail":$detail,"sentinel":{"best":${f(sentinelBest)},"series":$sentinelJson},"load_suspect_count":$suspects,"sf":"$sfDir","failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
