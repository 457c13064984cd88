package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{CdpEvent, CdpPipeline, EntityEvent, EntityPipeline}

/** Streaming throughput benchmark against the reference's stated design
  * target of 10k+ events/sec (`BASELINE.md`): pumps synthetic CDP events
  * through the full stateful pipeline (dedup -> profile merge -> segment
  * diff) via MemoryStream and reports events/sec.
  *
  * Measured on local[32] (sustained, 1704-byte avg state/profile):
  *  - 32 state partitions, 20k batches:  ~4.7k events/s (per-partition
  *    state-store commit overhead dominates — the wrong config)
  *  -  8 state partitions, 20k batches: ~21k events/s
  *  -  4 state partitions, 20k batches: ~27k events/s
  *  -  8 state partitions, 10k batches (1 s cadence at the target rate):
  *    ~13k events/s — above the reference's 10k/s floor at its own latency
  * The lesson for cluster sizing: the state-partition count must track
  * keyed-state volume and per-batch row count, NOT total cores — every
  * state partition pays a fixed commit/snapshot cost per micro-batch, so
  * oversizing it multiplies fixed cost without adding useful parallelism.
  * At 100 TB state the same knob scales UP (thousands of partitions) for
  * the same reason it scales DOWN here.
  *
  * `runMain graft.StreamBench [nEvents] [cores] [batchSize] [shufflePartitions]`
  * — prints one JSON line and enforces a throughput FLOOR (see below).
  */
object StreamBench {

  /** Locale-independent fixed-point formatting for the JSON artifacts:
    * the f-interpolator uses the default JVM locale, which renders a
    * decimal COMMA on e.g. de_DE — malformed JSON the round driver's
    * json.load rejects (same bug class CurationPipeline.f4 documents).
    */
  private def fmt(d: Double, dec: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(d))

  /** Regression floors (events/s) at the standard config (>=100k events,
    * 20k batches, <=8 state partitions): measured healthy numbers are
    * ~21k CDP / ~38k entity on this box, so a run below floor means a
    * real slowdown (2x margin), not noise. Below floor with a STABLE
    * sentinel -> exit 1 (regression); below floor with a drifted sentinel
    * -> exit 0 with `load_suspect:true` in the artifact (external box
    * load — mechanically distinguished, like Bench). Set
    * SPARK_GRAFT_STREAM_FLOOR=0 to disable, or "cdp,entity" to override
    * both floors.
    */
  val CdpFloorPerSec = 15000.0
  val EntityFloorPerSec = 25000.0

  /** `runMain graft.StreamBench stateprobe [nEvents] [cores] [profilesCsv]`
    * — the state-SCALE curve: the same CDP pipeline and event volume
    * pumped against geometrically growing keyed-profile populations,
    * recording throughput alongside the state store's own metrics (rows,
    * memory, RocksDB SST bytes, per-batch update/commit ms from
    * `lastProgress`). The claim under test for 100 TB state: per-batch
    * cost tracks the BATCH's updates, not the accumulated profile count —
    * throughput may pay state-store constants but must not degrade
    * multiplicatively as resident state grows 50×. (State partitions stay
    * fixed at 8, the measured-healthy config, so the only variable is
    * state volume.)
    *
    * profilesCsv overrides the default decade ladder (e.g.
    * "2000000,10000000" probes just the 2M and 10M points — running the
    * whole ladder at the 20M events the 10M point needs would pump 160M
    * events for six points already measured in r11).
    */
  def stateProbe(n: Int, cores: Int, profilesCsv: Option[String] = None): Unit = {
    val spark = Sessions.streaming("stream-state-probe", cores)
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    // recentProgress defaults to the LAST 100 entries: a run with more
    // micro-batches would silently average only the late (largest-state)
    // batches — biasing the exact per-batch-cost curve this probe defends
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // decades are capped at n/2 so every config keeps >= 2 events per
    // profile on average — the 400k/1M rows need `stateprobe 2000000`.
    // A small n that filters out every config still probes once at n/2
    // (max 1) instead of silently producing no output.
    val configs = profilesCsv match {
      case Some(csv) => csv.split(",").toSeq.map(_.trim.toInt)
        .map(p => math.min(p, math.max(1, n / 2)))
      case None => Seq(2000, 10000, 40000, 100000, 400000, 1000000)
        .filter(_ <= n / 2) match {
        case Seq() => Seq(math.max(1, n / 2))
        case cs    => cs
      }
    }
    def mkEvent(i: Int, profiles: Int): CdpEvent =
      CdpEvent(
        eventId = s"e$i",
        ts = new Timestamp(1704067200000L + i.toLong * 10),
        eventType = if (i % 10 == 0) "IDENTIFY" else "TRACK",
        userId = Some(s"u${i % profiles}"), anonymousId = None, email = None,
        name = Some("feature_used"),
        traits = if (i % 10 == 0)
          Map("plan" -> (if (i % 20 == 0) "pro" else "free")) else Map.empty)
    for (profiles <- configs) {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdpEvent]
      val query = CdpPipeline.segmentEvents(spark, input.toDS())
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      // events materialize PER CHUNK (the 10M-profile point pumps 20M
      // events — one eager n-sized Seq of boxed CdpEvents would hold
      // gigabytes on the driver for no benefit)
      (0 until n by 20000).foreach { start =>
        val b = (start until math.min(start + 20000, n)).map(mkEvent(_, profiles))
        input.addData(b)
        query.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val progs = query.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
        .recentProgress.filter(_.numInputRows > 0)
      val ops = progs.flatMap(_.stateOperators)
      val last = query.lastProgress.stateOperators
      def sumLast(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long): Long =
        last.map(f).sum
      val sst = last.flatMap(o =>
        Option(o.customMetrics.get("rocksdbSstFileSize")).map(_.longValue)).sum
      val avgUpdateMs = if (ops.isEmpty) 0.0 else ops.map(_.allUpdatesTimeMs).sum.toDouble / progs.length
      val avgCommitMs = if (ops.isEmpty) 0.0 else ops.map(_.commitTimeMs).sum.toDouble / progs.length
      query.stop()
      println(s"""{"metric":"cdp_state_scale","profiles":$profiles,"events":$n,"events_per_sec":${fmt(n / secs, 0)},"state_rows":${sumLast(_.numRowsTotal)},"state_memory_bytes":${sumLast(_.memoryUsedBytes)},"rocksdb_sst_bytes":$sst,"avg_update_ms_per_batch":${fmt(avgUpdateMs, 0)},"avg_commit_ms_per_batch":${fmt(avgCommitMs, 0)},"batches":${progs.length}}""")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("stateprobe")) {
      stateProbe(
        if (args.length > 1) args(1).toInt else 200000,
        if (args.length > 2) args(2).toInt else 8,
        if (args.length > 3) Some(args(3)) else None)
      return
    }
    val n = if (args.length > 0) args(0).toInt else 200000
    val cores = if (args.length > 1) args(1).toInt else 8
    val batchSize = if (args.length > 2) args(2).toInt else 20000
    val parts = if (args.length > 3) args(3).toInt else 8
    // streaming session: transformWithState requires the RocksDB provider
    val spark = Sessions.streaming("stream-bench", cores)
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // deterministic workload: 2k profiles, 5% duplicate ids, monotone ts
    val events = (0 until n).map { i =>
      val dup = i % 20 == 19
      // a duplicate re-delivers the PREVIOUS event's id to the previous
      // event's profile, so the dedup hit path is actually exercised
      val user = if (dup) s"u${(i - 1) % 2000}" else s"u${i % 2000}"
      CdpEvent(
        eventId = if (dup) s"e${i - 1}" else s"e$i",
        ts = new Timestamp(1704067200000L + i.toLong * 10),
        eventType = if (i % 10 == 0) "IDENTIFY" else "TRACK",
        userId = Some(user), anonymousId = None, email = None,
        name = Some("feature_used"),
        traits = if (i % 10 == 0) Map("plan" -> (if (i % 20 == 0) "pro" else "free"))
                 else Map.empty)
    }
    val eevents = (0 until n).map { i =>
      EntityEvent(
        eventId = s"e$i",
        ts = new Timestamp(1704067200000L + i.toLong * 10),
        entityId = s"ent${i % 2000}",
        eventType = if (i % 2 == 0) "CONN_BYTES" else "LOGIN",
        value = if (i % 2 == 0) Some(100L + (i % 37) * 40L) else None,
        geo = Some(if (i % 97 == 0) "DE" else "US"),
        device = None)
    }

    /** One full CDP + entity measurement with fresh state (unique query
      * names per attempt — memory-sink temp views are not replaceable).
      */
    def measureOnce(attempt: Int): (Double, Long, Double, Long) = {
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdpEvent]
      val query = CdpPipeline.segmentEvents(spark, input.toDS())
        .writeStream.format("memory").queryName(s"sb_segments$attempt")
        .outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      events.grouped(batchSize).foreach { b =>
        input.addData(b)
        query.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val emitted = spark.table(s"sb_segments$attempt").count()
      query.stop()

      // entity pipeline: per-(entity,type) sliding-window rules engine
      val einput = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EntityEvent]
      val equery = EntityPipeline.alerts(spark, einput.toDS())
        .writeStream.format("memory").queryName(s"sb_alerts$attempt")
        .outputMode(OutputMode.Append()).start()
      val t1 = System.nanoTime()
      eevents.grouped(batchSize).foreach { b =>
        einput.addData(b)
        equery.processAllAvailable()
      }
      val esecs = (System.nanoTime() - t1) / 1e9
      val alerts = spark.table(s"sb_alerts$attempt").count()
      equery.stop()
      (secs, emitted, esecs, alerts)
    }

    // incremental identity resolution. The interesting number is SECONDS
    // PER BATCH: each micro-batch pays the contraction joins + a tiny CC
    // + the delta write — a handful of Spark jobs whose cost tracks the
    // BATCH, not the accumulated graph (a full-recompute design would
    // slow down every batch as edges accumulate). Edge throughput scales
    // with batch size, not batch count. Workload: u<i> — k<i%500> stars
    // re-delivered 5x, so later batches are mostly known edges.
    val nEdges = math.min(n / 10, 20000)
    val idDir = java.nio.file.Files.createTempDirectory("sb_identity").toString
    val iinput = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val (iwriter, mapping) = graft.streaming.IdentityStream.resolver(
      spark, iinput.toDF().toDF("src", "dst"), s"$idDir/labels")
    val iquery = iwriter.start()
    val iedges = (0 until nEdges).map(i => (s"u:${i % 4000}", s"k:${i % 500}"))
    val batches = iedges.grouped(math.max(nEdges / 4, 1)).toSeq
    val t2 = System.nanoTime()
    batches.foreach { b =>
      iinput.addData(b)
      iquery.processAllAvailable()
    }
    val isecs = (System.nanoTime() - t2) / 1e9
    val mapped = mapping.df.count()
    iquery.stop()
    // max(1): tiny nEvents yields zero identity batches — a 0-divide here
    // would print bare NaN and corrupt the JSON metric line
    val nIdBatches = math.max(batches.length, 1)

    // floor guard: only meaningful at the standard workload shape (enough
    // events to amortize startup, standard batch size, few state
    // partitions); tiny smoke runs are exempt. Best-of-3: the box's
    // run-to-run variance is ±30-40% under external load, so a single
    // sample below floor retries — a REAL 2x regression fails all three
    // attempts, a load spike passes on a later one.
    val (cdpFloor, entityFloor) = sys.env.get("SPARK_GRAFT_STREAM_FLOOR") match {
      case Some("0") => (0.0, 0.0)
      case Some(s) if s.contains(",") =>
        val p = s.split(",", 2); (p(0).toDouble, p(1).toDouble)
      case _ => (CdpFloorPerSec, EntityFloorPerSec)
    }
    val guardActive = n >= 100000 && batchSize >= 20000 && parts <= 8
    val maxAttempts = if (guardActive) 3 else 1

    // Sentinel probes bracket every attempt (same pure-compute probe as
    // Bench — its only variable is box load): a sample drifting ≥2× above
    // the session best marks the run `load_suspect`. A floor failure on a
    // load-suspect run is then reported as INTERFERENCE (artifact says so,
    // exit 0) instead of a regression (exit 1) — retrying alone can't make
    // that call, because under sustained external load all three attempts
    // fail the floor with healthy code.
    spark.range(1000).write.format("noop").mode("overwrite").save() // warm sink
    Bench.sentinelOnce(spark) // discarded: first run pays JIT, not load
    val sentinels = scala.collection.mutable.ArrayBuffer[Double]()
    // each bracket point: short settle + best-of-2 — right after an attempt
    // the pipeline's own after-effects (RocksDB maintenance threads, GC of
    // the memory sink) inflate a single immediate sample, which is INTERNAL
    // noise, not the external load the sentinel is meant to witness
    def sentinelSample(): Double = {
      Thread.sleep(500)
      math.min(Bench.sentinelOnce(spark), Bench.sentinelOnce(spark))
    }
    sentinels += sentinelSample()

    var attempt = 0
    var bestCdp = 0.0
    var bestEntity = 0.0
    var last: (Double, Long, Double, Long) = null
    var belowFloor = true
    while (attempt < maxAttempts && belowFloor) {
      attempt += 1
      last = measureOnce(attempt)
      sentinels += sentinelSample()
      bestCdp = math.max(bestCdp, n / last._1)
      bestEntity = math.max(bestEntity, n / last._3)
      belowFloor = guardActive &&
        (bestCdp < cdpFloor || bestEntity < entityFloor)
      if (belowFloor && attempt < maxAttempts)
        System.err.println(f"[streambench] attempt $attempt below floor " +
          f"(cdp ${n / last._1}%.0f/s entity ${n / last._3}%.0f/s) — retrying")
    }
    val (secs, emitted, esecs, alerts) = last
    val sentBest = sentinels.min
    val sentWorst = sentinels.max
    val loadSuspect = sentWorst >= 2.0 * sentBest
    val sentSeries = sentinels.map(v => fmt(v, 3)).mkString("[", ",", "]")

    println(s"""{"metric":"stream_throughput","events":$n,"batch_size":$batchSize,"cdp_seconds":${fmt(secs, 2)},"cdp_events_per_sec":${fmt(n / secs, 0)},"segment_events":$emitted,"entity_seconds":${fmt(esecs, 2)},"entity_events_per_sec":${fmt(n / esecs, 0)},"alerts":$alerts,"identity_edges":$nEdges,"identity_batches":${batches.length},"identity_sec_per_batch":${fmt(isecs / nIdBatches, 2)},"identity_edges_per_sec":${fmt(nEdges / math.max(isecs, 1e-9), 0)},"identity_mapped":$mapped,"best_cdp_events_per_sec":${fmt(bestCdp, 0)},"best_entity_events_per_sec":${fmt(bestEntity, 0)},"attempts":$attempt,"floor_cdp":${fmt(cdpFloor, 0)},"floor_entity":${fmt(entityFloor, 0)},"floor_active":$guardActive,"below_floor":$belowFloor,"sentinel":{"best":${fmt(sentBest, 3)},"worst":${fmt(sentWorst, 3)},"series":$sentSeries},"load_suspect":$loadSuspect}""")
    spark.stop()
    if (belowFloor && loadSuspect) {
      System.err.println(f"[streambench] below floor after $attempt attempts " +
        f"but sentinel drifted ${sentWorst / sentBest}%.1fx " +
        f"(${sentBest}%.3f s → ${sentWorst}%.3f s): external box load, " +
        "not a regression — artifact marked load_suspect")
    } else if (belowFloor) {
      System.err.println(f"[streambench] BELOW FLOOR after $attempt attempts: " +
        f"best cdp ${bestCdp}%.0f/s (floor ${cdpFloor}%.0f) " +
        f"best entity ${bestEntity}%.0f/s (floor ${entityFloor}%.0f); " +
        f"sentinel stable (${sentBest}%.3f s → ${sentWorst}%.3f s) — regression")
      sys.exit(1)
    }
  }
}
