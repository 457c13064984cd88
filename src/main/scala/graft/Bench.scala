package graft

/** Bench main: runs every registered query on SPARK_GRAFT_SF_DIR and prints
  * ONE JSON line `{"metric":"total","value":N,"unit":"sec","queries":{...}}`.
  * A query that throws is recorded as `"<name>":"error"` (not a fake fast
  * timing) and the process exits non-zero so crashes can't masquerade as
  * wins in the bench artifact.
  *
  * Methodology (four fidelity rules, all learned the hard way):
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
  *     that drifts ≥2× above the session-best sentinel marks BOTH the block
  *     of queries just finished (the load was building while they ran) and
  *     the following block `load_suspect:true`; the closing sample applies
  *     the same retroactive rule to the tail block. A query whose MEDIAN
  *     sits ≥1.5× above its own min is also suspect (median/min, not
  *     max/min — run 1 always pays that query's codegen compile, which the
  *     median absorbs but the max would flag on every query). How to read:
  *       - `queries` (name → median) is unchanged — round-over-round compare.
  *       - `queries_detail[name].min` is the load-floor: the best this code
  *         did THIS session. A median far above its own min = transient load,
  *         not code. Compare `min` across rounds when `load_suspect` is true.
  *       - `sentinel.series` is the drift log; `load_suspect_count` > 0 means
  *         treat inflated medians as unproven, re-bench idle before judging.
  *       - Round-12 lesson: when the box is NEVER quiet, the retry pass
  *         cannot fire and the suspect flags mark the problem without
  *         fixing the headline (BENCH_r12: 453.9 s recorded for a ~92 s
  *         build). Both JSON lines now carry an honest-headline pair a
  *         reader can use without hunting the committed stamp:
  *         `total_min_floor` (sum of per-query session mins — the best
  *         number this session DEMONSTRATED; quiet truth <= floor <=
  *         value, since a loaded min is still slower than quiet) and
  *         `load_normalized_total` (suspect medians deflated by the
  *         sentinel inflation factor bracketing their block; clean
  *         queries contribute raw medians) — the point estimate of the
  *         quiet-box cost, which may sit below the floor.
  *       - The artifact SELF-HEALS: after the closing sentinel, suspects are
  *         re-measured hottest-first under SPARK_GRAFT_RETRY_BUDGET_SEC
  *         (default 300 s) while a fresh sentinel stays within 1.5x of
  *         session-best; an accepted retry replaces the headline median and
  *         archives the loaded-window original as `first_attempt`.
  *         Round-11 lesson: without this, one load window mid-run left a
  *         186 s headline on a build whose honest total was ~85 s.
  *   - The artifact must SURVIVE A MID-RUN CRASH. Round-6 lesson: the
  *     SparkContext died mid-suite on the driver box and the whole artifact
  *     was lost (rc 1, no JSON) because sentinel samples ran outside the
  *     per-query try and the JSON printed only after the full loop. Now
  *     every sentinel sample is caught, results accumulate incrementally,
  *     and a JVM shutdown hook emits the partial artifact with
  *     `"aborted":true` if the normal end-of-run print never happened — a
  *     dying run still reports everything it measured.
  */
object Bench {
  /** Basename of the canonical drift-baseline data dir: only a session on
    * THIS sf writes the committed round stamp, and loadStamp only trusts a
    * stamp whose "sf" matches the session (the full-path compare there is
    * the same rule one level stricter). One constant so the stamp guard
    * and the reader can't drift apart (r14 ADVICE).
    */
  val CanonicalSf = "sf0.1"

  /** Stamp-acceptance rule (round-15, closes the loaded-sf0.1 clobber):
    * a session whose best sentinel is >= `StampSentinelFactor`x the
    * committed stamp's best sentinel ran on a measurably noisier box —
    * its medians must not replace the committed drift baseline (the r14
    * driver window, sentinel 0.87 vs the 0.61 clean stamp, overwrote a
    * 90.3 s baseline with 97.9 s; every later drift check would have
    * compared against inflated numbers). A missing/degenerate stamp
    * sentinel accepts (nothing to protect); SPARK_GRAFT_FORCE_STAMP=1
    * overrides for an intentional re-stamp.
    */
  val StampSentinelFactor = 1.25
  private[graft] def acceptStamp(sessionBest: Double, stampBest: Option[Double],
                                 force: Boolean): Boolean =
    force || stampBest.forall(s =>
      s <= 0.0 || sessionBest <= 0.0 || sessionBest < StampSentinelFactor * s)

  /** Extract `sentinel.best` from a prior Bench artifact line (same
    * hand-rolled discipline as parseStampQueries — this file's own format).
    */
  private[graft] def parseStampSentinel(json: String): Option[Double] = {
    val re = """"sentinel":\{"best":([0-9][0-9.eE+-]*)""".r
    re.findFirstMatchIn(json).map(_.group(1).toDouble)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Fixed-cost calibration probe: pure-compute aggregation over a local
    * range — no disk I/O, one small fixed-size shuffle (1024 groups),
    * ~0.4 s idle at 4 cores. Its only variable is box load, so drift in
    * its timing is direct evidence of contention.
    *
    * The explicit gc() defends that claim at materialized tiers: 10x-
    * sized queries leave the old gen full of shuffle/cache garbage, and
    * a sentinel sampled mid-collection reads 2-4x slow on an IDLE box —
    * the r14 10x stamp flagged 71/133 queries as load suspects with the
    * box's load average at 0.04. Collecting first makes the sample
    * measure the BOX again, not the benchmark's own heap debt.
    */
  private[graft] def sentinelOnce(spark: org.apache.spark.sql.SparkSession): Double = {
    System.gc()
    val t0 = System.nanoTime()
    spark.range(4000000)
      .selectExpr("id % 1024 AS k", "md5(CAST(id AS STRING)) AS h")
      .groupBy("k").agg(org.apache.spark.sql.functions.max("h"))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  final case class QStat(median: Double, min: Double, spread: Double,
                         loadSuspect: Boolean)

  /** Round-13 lesson (driver artifact): SUSTAINED load evades both the
    * spread heuristic (all `runs` samples uniformly inflated → spread
    * ~1.1) and the sentinel block flag (the bracketing samples can land
    * in momentary lulls): q_cms_estimate recorded 5.81 s median /
    * spread 1.13 / load_suspect false against a 0.44 s committed stamp,
    * and `load_normalized_total` silently carried ~5 s of inflation.
    * The repo SHIPS the previous clean stamp — so compare each session
    * median against the stamp's median for the same query and flag
    * anything > `StampDriftFactor`x it, independent of spread. A
    * flagged query enters the end-of-run clean-window retry pass; a
    * genuine regression re-measures to the same number in a
    * verified-quiet window and STAYS flagged (honest), while sustained
    * load re-measures back to the stamp's neighborhood.
    */
  val StampDriftFactor = 2.5
  // absolute guard under the ratio: a 0.04 -> 0.11 s wobble is box
  // noise on a sub-100ms query, not the seconds-scale sustained
  // inflation this flag exists for — flagging it would burn the retry
  // budget the genuinely-inflated queries need
  val StampDriftMinDeltaSec = 0.25

  private[graft] def stampDrift(median: Double, stamp: Option[Double]): Boolean =
    stamp.exists(s => s > 0.0 && median > StampDriftFactor * s &&
      median - s > StampDriftMinDeltaSec)

  /** Extract the per-query medians from a prior Bench artifact line —
    * the `"queries":{"name":sec,...}` map (values may also be "error",
    * skipped). Hand-rolled against the format this file itself emits.
    */
  private[graft] def parseStampQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) return Map.empty
    val open = start + "\"queries\":".length
    var depth = 0
    var end = open
    var i = open
    while (i < json.length && end == open) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ => ()
      }
      i += 1
    }
    val body = json.substring(open + 1, end)
    val entry = """"([^"]+)":([0-9][0-9.eE+-]*)""".r
    entry.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Find the committed clean stamp to drift-check against: the highest
    * round-numbered BENCH_LOCAL_r<N>.json whose `"sf"` matches this
    * run's sfDir (a sf0.1 session must not be compared to a 10x-tier
    * stamp), env-overridable via SPARK_GRAFT_STAMP. Absent/unreadable →
    * no drift flags (the feature degrades to r13 behavior).
    */
  private[graft] def loadStamp(sfDir: String): (Option[String], Map[String, Double]) = {
    def read(p: String): Option[(String, Map[String, Double])] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
        if (txt.contains(s""""sf":"$sfDir"""")) Some(p -> parseStampQueries(txt))
        else None
      } catch { case _: Throwable => None }
    sys.env.get("SPARK_GRAFT_STAMP").flatMap(read).orElse {
      val re = """BENCH_LOCAL_r(\d+)\.json""".r
      Option(new java.io.File(".").list()).getOrElse(Array.empty)
        .collect { case n @ re(r) => (r.toInt, n) }
        .sortBy(-_._1)
        .iterator.flatMap { case (_, n) => read(n) }
        .nextOption()
    } match {
      case Some((p, m)) => (Some(p), m)
      case None => (None, Map.empty)
    }
  }

  /** Retry-pass ordering: hottest suspect medians first — they distort the
    * headline total the most, so a bounded retry budget buys back the most
    * honesty per second there.
    */
  private[graft] def retryOrder(suspects: Seq[(Int, QStat)]): Seq[Int] =
    suspects.sortBy(-_._2.median).map(_._1)

  /** Sentinel inflation factor for the query at position `idx`: the mean
    * of the sentinel samples bracketing its block (the last sample taken
    * at-or-before it and the first taken after it), over the session-best
    * sentinel, clamped at >= 1. The bracketing samples are the only direct
    * evidence of how loaded the box was WHILE that query ran.
    */
  private[graft] def inflationFactor(idx: Int, sentinels: Seq[(Int, Double)],
                                     best: Double): Double =
    if (best <= 0.0) 1.0
    else {
      val bracket = sentinels.filter(_._1 <= idx).lastOption.map(_._2).toSeq ++
        sentinels.find(_._1 > idx).map(_._2).toSeq
      if (bracket.isEmpty) 1.0
      else math.max(1.0, (bracket.sum / bracket.size) / best)
    }

  /** Load-normalized headline: suspects contribute median ÷ their block's
    * sentinel inflation factor; clean queries (including accepted clean
    * retries — their number was re-measured in a verified-quiet window,
    * so dividing it again would double-correct) contribute the raw
    * median. On a quiet box every factor ≈ 1 and this equals the plain
    * total; on a saturated box it is the defensible estimate of the
    * quiet-box total that two rounds of driver artifacts lacked.
    */
  private[graft] def loadNormalizedTotal(entries: Seq[(QStat, Boolean, Double)]): Double =
    entries.map { case (st, suspect, factor) =>
      if (suspect) st.median / math.max(1.0, factor) else st.median
    }.sum

  /** Merge a clean-window retry with the original measurement. A retry
    * that is itself clean REPLACES the original (that is the whole point:
    * the re-measure ran with the sentinel verified quiet, so its median is
    * the honest number even when it is HIGHER than a lucky loaded-window
    * min). A retry that came out suspect again keeps whichever median is
    * lower and stays flagged. Returns (chosen, replacedByRetry).
    */
  private[graft] def mergeRetry(first: QStat, retry: QStat): (QStat, Boolean) =
    if (!retry.loadSuspect) (retry, true)
    else if (retry.median < first.median) (retry, true)
    else (first, false)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val sentinelEvery =
      sys.env.getOrElse("SPARK_GRAFT_SENTINEL_EVERY", "10").toInt.max(1)
    // optional args: substring filters — bench only matching queries
    val filters = args.toSeq
    // committed clean stamp for sustained-load drift detection (r13
    // driver lesson — see StampDriftFactor's scaladoc)
    val (stampFile, stampMedians) = loadStamp(sfDir)
    stampFile.foreach(p => System.err.println(
      s"[bench] drift-checking against committed stamp $p (${stampMedians.size} queries)"))
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

    // ---- incremental state shared with the abort-path shutdown hook ----
    // Everything the artifact needs lives in these collections, appended to
    // as the run progresses, so a partial print is always possible.
    val results =
      scala.collection.mutable.ArrayBuffer[(String, Either[String, QStat])]()
    // retroactively-flagged query indices (sentinel drift indicts the block
    // that ran BEFORE the drifted sample too, not just the one after it)
    val suspectIdx = scala.collection.mutable.Set[Int]()
    // original measurements of queries the end-of-run clean-window pass
    // re-measured (emitted as `first_attempt` so the artifact keeps both)
    val firstAttempt = scala.collection.mutable.Map[Int, QStat]()
    val sentinelSeries = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    @volatile var sentinelBest = Double.MaxValue
    @volatile var failedCount = 0
    @volatile var printedArtifact = false
    val emitLock = new Object

    def f(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

    /** Build + print the ONE-line artifact exactly once. Called normally at
      * end-of-run (aborted=false) or from the shutdown hook (aborted=true)
      * when the run died before reaching the normal print.
      */
    def emit(aborted: Boolean): Unit = emitLock.synchronized {
      if (printedArtifact) return
      printedArtifact = true
      val snap = results.toSeq
      val qs = snap.map {
        case (k, Right(v)) => s""""$k":${f(v.median)}"""
        case (k, Left(_))  => s""""$k":"error""""
      }.mkString("{", ",", "}")
      val detail = snap.zipWithIndex.map {
        case ((k, Right(v)), i) =>
          val suspect = v.loadSuspect || suspectIdx.contains(i)
          val fa = firstAttempt.get(i).map { o =>
            s""","first_attempt":{"median":${f(o.median)},"min":${f(o.min)},"spread":${f(o.spread)}}"""
          }.getOrElse("")
          s""""$k":{"median":${f(v.median)},"min":${f(v.min)},"spread":${f(v.spread)},"load_suspect":$suspect$fa}"""
        case ((k, Left(_)), _) => s""""$k":{"error":true}"""
      }.mkString("{", ",", "}")
      val sentinelJson = sentinelSeries
        .map { case (i, s) => s"""{"at_query":$i,"sec":${f(s)}}""" }
        .mkString("[", ",", "]")
      val suspects = snap.zipWithIndex.count {
        case ((_, Right(v)), i) => v.loadSuspect || suspectIdx.contains(i)
        case _                  => false
      }
      val total = snap.collect { case (_, Right(v)) => v.median }.sum
      val best = if (sentinelBest == Double.MaxValue) 0.0 else sentinelBest
      // honest-headline pair for a never-quiet box (two rounds of driver
      // artifacts recorded 2.1x / 4.9x inflated totals with no defensible
      // number a reader could use without hunting the committed stamp):
      //  - total_min_floor: sum of per-query session mins — the best
      //    number this session demonstrated (quiet truth <= floor <=
      //    value: a loaded min is still slower than quiet)
      //  - load_normalized_total: suspects deflated by their block's
      //    sentinel inflation factor — the point estimate of the
      //    quiet-box total (may legitimately sit below the floor)
      val sentinelSnap = sentinelSeries.toSeq
      val minFloor = snap.collect { case (_, Right(v)) => v.min }.sum
      val normalized = loadNormalizedTotal(snap.zipWithIndex.collect {
        case ((_, Right(v)), i) =>
          // a median REPLACED by the end-of-run retry pass was measured
          // in the retry window — the main-run sentinel brackets around
          // position i describe a window it never ran in, so deflating
          // it by them would mis-normalize; report replaced medians raw
          // (conservative) whether or not they stayed suspect
          val factor =
            if (firstAttempt.contains(i)) 1.0
            else inflationFactor(i, sentinelSnap, best)
          (v, v.loadSuspect || suspectIdx.contains(i), factor)
      })
      val stampJson = stampFile.map(p => s""""$p"""").getOrElse("null")
      val full =
        s"""{"metric":"total","value":${f(total)},"unit":"sec","total_min_floor":${f(minFloor)},"load_normalized_total":${f(normalized)},"queries":$qs,"queries_detail":$detail,"sentinel":{"best":${f(best)},"series":$sentinelJson},"load_suspect_count":$suspects,"retried":${firstAttempt.size},"stamp":$stampJson,"sf":"$sfDir","failed":$failedCount,"aborted":$aborted}"""
      println(full)
      // The full line above outgrew the round driver's 2000-char stdout
      // tail capture (BENCH_r08 landed parsed:null), so the artifact is
      // ALSO (a) written whole to a committed file and (b) summarized in a
      // compact headline printed as the FINAL stdout line — any tail
      // window parses it. `hottest` names the 5 slowest medians.
      val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
      }
      // Round-stamped copy (r10 lesson: per-query round-over-round diffs
      // required git archaeology on BENCH_LOCAL.json). Round = env override,
      // else max driver stamp BENCH_r<N>.json + 1 (the driver writes its
      // stamp AFTER the run, so during round N the max on disk is N-1).
      try {
        val round = sys.env.get("SPARK_GRAFT_ROUND").map(_.toInt).getOrElse {
          val re = """BENCH_r(\d+)\.json""".r
          val stamps = Option(new java.io.File(".").list()).getOrElse(Array.empty)
            .collect { case re(n) => n.toInt }
          if (stamps.isEmpty) 0 else stamps.max + 1
        }
        // the round-stamped copy IS the drift baseline for the canonical
        // sf0.1 session (loadStamp matches on "sf"), so a tier run (sf =
        // a MakeTier directory) must not clobber it — r14 lesson: a
        // 10x-tier bench silently replaced the committed sf0.1 stamp,
        // and every later sf0.1 session would have run drift-unchecked
        // (loadStamp skips sf-mismatched stamps, it cannot restore them).
        // Basename compare, not a path-suffix heuristic (a relative
        // "sf0.1" must still stamp); aborted emits (shutdown hook) must
        // never stamp either — a Ctrl-C'd run would poison the baseline
        // with partial, load-distorted medians just like the tier did
        val canonicalSf =
          try java.nio.file.Paths.get(sfDir).getFileName.toString == CanonicalSf
          catch { case _: Throwable => false }
        if (round > 0 && filters.isEmpty && !aborted && canonicalSf) {
          val stampPath = java.nio.file.Paths.get(f"BENCH_LOCAL_r$round%02d.json")
          // sentinel-gated acceptance: a loaded session must not replace a
          // quieter committed stamp (see acceptStamp's scaladoc)
          val prevSentinel =
            if (java.nio.file.Files.exists(stampPath))
              parseStampSentinel(new String(
                java.nio.file.Files.readAllBytes(stampPath),
                java.nio.charset.StandardCharsets.UTF_8))
            else None
          val force = sys.env.get("SPARK_GRAFT_FORCE_STAMP").contains("1")
          if (acceptStamp(best, prevSentinel, force))
            java.nio.file.Files.writeString(stampPath, full + "\n")
          else System.err.println(
            s"[bench] round stamp NOT written: session sentinel ${f(best)} >= " +
              s"${StampSentinelFactor}x the committed stamp's ${prevSentinel.map(f).getOrElse("?")} " +
              s"(box was loaded; SPARK_GRAFT_FORCE_STAMP=1 to override)")
        } else if (round > 0 && !aborted && !canonicalSf && filters.isEmpty)
          // a non-stamping canonical-looking run must be VISIBLE (r14
          // ADVICE: a symlinked/renamed data dir would quietly stop
          // refreshing the drift baseline)
          System.err.println(
            s"[bench] round stamp not written: $sfDir is not a $CanonicalSf session")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write round-stamped copy: ${e.getMessage}")
      }
      val hottest = snap.collect { case (k, Right(v)) => (k, v.median) }
        .sortBy(-_._2).take(5)
        .map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
      println(s"""{"metric":"total","value":${f(total)},"unit":"sec","total_min_floor":${f(minFloor)},"load_normalized_total":${f(normalized)},"sf":"$sfDir","queries_run":${snap.size},"failed":$failedCount,"load_suspect_count":$suspects,"retried":${firstAttempt.size},"sentinel_best":${f(best)},"aborted":$aborted,"hottest":$hottest,"detail_file":"$outFile"}""")
      System.out.flush()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(aborted = true)))

    // The funnel family stamps as ONE pipeline metric (r16 ADVICE):
    // q_curation_funnel's report materializes every stage boundary, so it
    // IS the full-pipeline measurement once the shared stages are released
    // between runs (below); the five per-stage dump queries are prefixes
    // of that same computation, kept for the staged correctness gate, and
    // benching them separately would re-pay the shared prefix five times
    // (the exact shape the r15→r16 sharing removed). They stay measurable
    // under an explicit name filter.
    val stageDumpNames =
      graft.queries.CurationQueries.SharedStageQueryNames - "q_curation_funnel"
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        if (filters.nonEmpty) filters.exists(name.contains)
        else !stageDumpNames.contains(name)
      }
    if (filters.isEmpty) System.err.println(
      s"[bench] funnel family stamps as q_curation_funnel (full pipeline per " +
        s"run); skipping ${stageDumpNames.size} stage-dump prefixes: " +
        stageDumpNames.toSeq.sorted.mkString(", "))

    /** One full measurement of a query: `runs` timed materializations →
      * QStat. Shared by the main loop and the end-of-run retry pass.
      */
    def measure(name: String,
                fn: (org.apache.spark.sql.SparkSession, String) =>
                  org.apache.spark.sql.DataFrame,
                blockWasLoaded: Boolean,
                countFailure: Boolean = true): Either[String, QStat] =
      try {
        // shared-funnel-stage queries: release the memoized stage leaves
        // BEFORE the first run and BETWEEN runs, so every timed
        // materialization pays the stage compute — without this, runs
        // after the first read back checkpoint leaves that deliberately
        // survive clearCache, and the stamped median excludes the very
        // cost the drift gate exists to watch (r16 ADVICE)
        val sharedStage =
          graft.queries.CurationQueries.SharedStageQueryNames.contains(name)
        if (sharedStage) graft.queries.CurationQueries.releaseStages()
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          // full materialization: every output column is computed
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache() // no cross-run/query cache pinning
          if (sharedStage) graft.queries.CurationQueries.releaseStages()
          dt
        }
        val mn = times.min
        val med = median(times)
        val spread = if (mn > 0) times.max / mn else 1.0
        // suspect when the MEDIAN sits far above the query's own min —
        // max/min would cry wolf on every query (run 1 always pays
        // that query's codegen compile; the median absorbs it) — OR far
        // above the committed clean stamp (sustained load inflates all
        // samples uniformly, so neither the spread rule nor the sentinel
        // block flag can see it; the stamp can)
        Right(QStat(med, mn, spread,
          loadSuspect = blockWasLoaded || (mn > 0 && med / mn >= 1.5) ||
            stampDrift(med, stampMedians.get(name))))
      }
      catch { case e: Throwable =>
        if (countFailure) failedCount += 1
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        try graft.queries.CurationQueries.releaseStages()
        catch { case _: Throwable => () }
        Left("error")
      }

    // index of the first query after the most recent sentinel sample — the
    // start of the block a drifted sample retroactively indicts
    var blockStart = 0
    var blockLoaded = false // sentinel verdict for the current query block

    /** Take a sentinel sample (crash-safe: a failed sample must never abort
      * the run and discard real measurements). Returns whether the sample
      * drifted ≥2× above the session-best; on failure, returns the previous
      * verdict unchanged (no evidence either way).
      */
    def sentinelSample(atQuery: Int): Boolean =
      try {
        val s = sentinelOnce(spark)
        emitLock.synchronized { sentinelSeries += ((atQuery, s)) }
        sentinelBest = sentinelBest.min(s)
        s >= 2.0 * sentinelBest
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] sentinel at $atQuery failed: ${e.getMessage}")
          blockLoaded
      }

    try {
      // calibration baseline: best of 3 at session start (the warm floor)
      try {
        sentinelOnce(spark) // discard first (JIT)
        sentinelBest = (1 to 3).map(_ => sentinelOnce(spark)).min
        emitLock.synchronized { sentinelSeries += ((0, sentinelBest)) }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] sentinel baseline failed: ${e.getMessage}")
      }

      selected.zipWithIndex.foreach { case ((name, fn), idx) =>
        if (idx % sentinelEvery == 0 && idx > 0) {
          val drifted = sentinelSample(idx)
          if (drifted) {
            // load was already present while [blockStart, idx) ran — the
            // drifted sample equally indicts the block just finished
            emitLock.synchronized { (blockStart until idx).foreach(suspectIdx += _) }
          }
          blockLoaded = drifted
          blockStart = idx
        }
        val r = measure(name, fn, blockLoaded)
        // under emitLock: the shutdown hook's emit() snapshots these
        // collections mid-run — an unsynchronized append during an
        // ArrayBuffer resize would crash the hook and lose the partial
        // artifact it exists to save
        emitLock.synchronized { results += (name -> r) }
      }
      // closing sentinel sample — retroactive evidence for the tail block
      // (queries after the last every-N sample have no following sentinel,
      // so a drifted closing sample is their only load evidence)
      if (sentinelSample(selected.size)) {
        emitLock.synchronized {
          (blockStart until selected.size).foreach(suspectIdx += _)
        }
      }

      // ---- end-of-run clean-window retry pass (round-11 lesson) ----
      // A transient load spike mid-run leaves dozens of inflated medians
      // that the suspect flags mark but do not FIX: BENCH_r11 recorded a
      // 186 s headline for a build whose honest total was ~85 s. Re-measure
      // the suspects now, hottest first, under a bounded time budget, and
      // only while a fresh sentinel confirms the box is quiet again
      // (within 1.5x of session-best — tighter than the 2x drift alarm,
      // because a retry's entire value is that its window is KNOWN-clean).
      // Each accepted retry replaces the headline number and archives the
      // original under `first_attempt`, so the artifact shows both.
      val retryBudgetSec =
        sys.env.getOrElse("SPARK_GRAFT_RETRY_BUDGET_SEC", "300").toDouble
      def sentinelQuiet(at: Int): Boolean =
        try {
          val sec = sentinelOnce(spark)
          emitLock.synchronized { sentinelSeries += ((at, sec)) }
          sentinelBest = sentinelBest.min(sec)
          sec <= 1.5 * sentinelBest
        } catch { case _: Throwable => false }
      val suspectsNow = emitLock.synchronized {
        results.toSeq.zipWithIndex.collect {
          case ((_, Right(v)), i) if v.loadSuspect || suspectIdx.contains(i) =>
            (i, v)
        }
      }
      if (suspectsNow.nonEmpty) {
        val order = retryOrder(suspectsNow)
        val t0 = System.nanoTime()
        // NOT a latch: one borderline sentinel sample must skip ONE
        // retry, not abandon the rest of the queue — at the 10x tier a
        // single 0.61 s sample (vs the 0.56 s gate) stranded 14
        // suspects the box was quiet enough to re-measure seconds
        // later. The budget bounds total retry time either way.
        var quiet = true
        for (idx <- order) {
          val elapsed = (System.nanoTime() - t0) / 1e9
          if (elapsed < retryBudgetSec) {
            // re-verify the window before EVERY retry: one cheap sentinel
            // sample vs `runs` full materializations. A load window
            // opening mid-stride inflates med and min together, so the
            // med/min self-check can't catch it — only the sentinel can,
            // and a stale every-5 verdict could re-stamp up to 5 suspect
            // medians as clean before anyone noticed.
            quiet = sentinelQuiet(selected.size + 1)
            if (quiet) {
              val (name, fn) = selected(idx)
              measure(name, fn, blockWasLoaded = false, countFailure = false) match {
                case Right(retry) =>
                  emitLock.synchronized {
                    val orig = results(idx)._2.toOption.get
                    val (chosen, replaced) = mergeRetry(orig, retry)
                    if (replaced) {
                      firstAttempt(idx) = orig
                      results(idx) = (name, Right(chosen))
                      if (!chosen.loadSuspect) suspectIdx -= idx
                    }
                  }
                case Left(_) => () // keep the original measurement
              }
            }
          }
        }
      }
      emit(aborted = false)
    } finally {
      // crash path: if anything above threw (including SparkContext death),
      // report what was measured before exiting
      emit(aborted = true)
    }
    // managed release of the shared funnel-stage leaves (the process is
    // exiting anyway; this keeps the contract demonstrated end-to-end)
    try graft.queries.CurationQueries.releaseStages()
    catch { case _: Throwable => () }
    try spark.stop() catch { case _: Throwable => () }
    if (failedCount > 0) sys.exit(1)
  }
}
