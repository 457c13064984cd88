package graft

import graft.streaming.CdpPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming↔batch end-state parity at tier scale: replay a data dir's
  * whole events table through the STREAMING CDP pipeline
  * (`CdpPipeline.profileUpdates` — transformWithState on RocksDB, real
  * micro-batches via a file source with maxFilesPerTrigger) and assert the
  * final per-profile snapshots equal the BATCH replay
  * (`CdpPipeline.profileSnapshots`, the fold q_cdp_profile_replay
  * hash-verifies against DuckDB up to the 100x tier).
  *
  * Why this closes a real gap: both paths share `applyEvent`, but the
  * streaming side additionally exercises state encoding, the RocksDB
  * store round-trip, cross-micro-batch state carry, and changed-only
  * emission — none of which the batch oracle sees, and which had only
  * ever been parity-checked at spec scale (sf0.1-class volumes) before
  * this harness. File order ≠ event-time order, so events arrive
  * out-of-order ACROSS micro-batches; `applyCore`'s end state is
  * arrival-order-insensitive by design (LWW under (ts, eventId), max
  * lastSeen, additive buckets pruned on the lastSeen horizon), which is
  * exactly the property this verifies at scale.
  *
  * KILL/RESTART mode (`SPARK_GRAFT_PARITY_KILL_AFTER=N`): stop the query
  * after N completed micro-batches, then restart it from the SAME
  * checkpoint and let AvailableNow drain the rest. This is the streaming
  * fault-tolerance surface — offset-log replay, state-version recovery,
  * and the re-executed batch's idempotence — at tier scale; the end state
  * must still equal the batch fold. The snapshot sink stays an append
  * parquet: a batch re-executed after the kill recomputes from the same
  * committed state version and offsets, so any duplicate (profileId,
  * batch_id) rows are bit-identical and the last-change recovery below is
  * insensitive to them (CheckpointRecoverySpec proves the toy-scale twin).
  *
  * Usage: runMain graft.StreamParity <dataDir> [workDir]
  *   SPARK_GRAFT_CPUS (16) / SPARK_GRAFT_PARITY_FILES (10) events-table
  *   part files per micro-batch / SPARK_GRAFT_PARITY_KILL_AFTER (0 = run
  *   to completion uninterrupted).
  * Prints ONE closing JSON line:
  *   {"metric":"stream_parity","events":N,"profiles_stream":N,
  *    "profiles_batch":N,"mismatched":N,"hash_stream":H,"hash_batch":H,
  *    "batches":N,"kill_after":N,"restarts":N,"match":bool,
  *    "stream_sec":S,"batch_sec":S,"dir":...}
  */
object StreamParity {

  /** Canonical comparable projection of a ProfileSnapshot relation:
    * arrays arrive sorted from toSnapshot; the trait map canonicalizes
    * via sorted entries. One string per profile → order-independent
    * bit_xor(xxhash64) fingerprint.
    */
  private def canon(df: DataFrame): DataFrame =
    df.select(col("profileId"),
      to_json(struct(
        col("profileId"), col("userIds"), col("emails"),
        col("anonymousIds"),
        array_sort(map_entries(col("traits"))).as("traits"),
        col("trackCount24h"),
        unix_micros(col("lastSeen")).as("last_seen_us"),
        col("segments"))).as("canon"))

  /** Locale-pinned decimal rendering: the f-interpolator is
    * locale-sensitive and a de_DE-style JVM would put a comma in the
    * closing JSON line (the IngestBench lesson).
    */
  private def jf(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val dataDir = args(0)
    val work = args.lift(1).getOrElse("/tmp/graft_stream_parity")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_PARITY_FILES", "10").toInt
    val killAfter = sys.env.getOrElse("SPARK_GRAFT_PARITY_KILL_AFTER", "0").toInt
    val spark = Sessions.streaming("graft-stream-parity", cpus)
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[parity] max heap = " +
      s"${Runtime.getRuntime.maxMemory() >> 30} GiB, cpus = $cpus, " +
      s"files/trigger = $filesPerTrigger, kill_after = $killAfter")

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(work))
    new java.io.File(work).mkdirs()

    // Probe the dir's ts encoding batch-side FIRST (caches the unit and,
    // for NANOS-annotated footers, leaves the session conf the stream
    // read needs); the raw file schema is then read under that conf, and
    // the stream frame gets the SAME adaptive conversion the batch side
    // applies — a raw INT64 ts would otherwise crash (or silently skew)
    // cdpEventLog on non-native-timestamp dirs.
    val batchEvents = Tables.events(spark, dataDir)
    val eventsPath = s"$dataDir/events.parquet"
    val schema = spark.read.parquet(eventsPath).schema
    val nEvents = spark.read.parquet(eventsPath).count()

    // ---- streaming side: file-source micro-batches → changed-only
    // snapshots, appended with their batch id so the LAST change per
    // profile is recoverable afterwards
    val t0 = System.nanoTime()
    def startQuery() = {
      val src = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger)
        .parquet(eventsPath)
      val snapshots = CdpPipeline.profileUpdates(
        spark, graft.queries.CdpReplay.cdpEventLog(
          spark, Tables.normalizeEventsTs(dataDir, src.toDF())))
      snapshots.toDF().writeStream
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          df.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$work/snapshots")
          ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    var restarts = 0
    val q = startQuery()
    if (killAfter > 0) {
      // poll until N micro-batches have completed, then stop the query
      // mid-flight and restart it from the checkpoint
      while (q.isActive &&
             (q.lastProgress == null || q.lastProgress.batchId + 1 < killAfter))
        Thread.sleep(200)
      if (q.isActive) {
        q.stop()
        q.awaitTermination()
        System.err.println(
          s"[parity] killed query after ~$killAfter micro-batches; restarting from checkpoint")
        restarts += 1
        startQuery().awaitTermination()
      } else {
        q.awaitTermination()
        System.err.println(
          s"[parity] stream drained before kill_after=$killAfter batches — ran clean")
      }
    } else q.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val emitted = spark.read.parquet(s"$work/snapshots")
    val nBatches = emitted.select(col("batch_id")).distinct().count()
    // final state per profile = the snapshot from the last batch that
    // changed it (changed-only emission → at most one distinct row per
    // (pid, batch); a kill/restart may append bit-identical duplicates,
    // which row_number collapses regardless of which copy it picks)
    val byPid = org.apache.spark.sql.expressions.Window
      .partitionBy(col("profileId")).orderBy(col("batch_id").desc)
    val finalStream = canon(emitted
      .withColumn("rn", row_number().over(byPid)).filter(col("rn") === 1)
      .drop("rn", "batch_id")).cache()

    // ---- batch side: the verified fold over the identical log
    val t1 = System.nanoTime()
    val finalBatch = canon(CdpPipeline.profileSnapshots(
      spark, graft.queries.CdpReplay.cdpEventLog(
        spark, batchEvents)).toDF()).cache()
    val nBatch = finalBatch.count()
    val batchSec = (System.nanoTime() - t1) / 1e9

    val nStream = finalStream.count()
    val mismatched = finalStream.withColumnRenamed("canon", "c_s")
      .join(finalBatch.withColumnRenamed("canon", "c_b"), Seq("profileId"), "full_outer")
      .filter(col("c_s").isNull || col("c_b").isNull || col("c_s") =!= col("c_b"))
      .count()
    def fp(df: DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(canon))")).head().getLong(0)
    val (hs, hb) = (fp(finalStream), fp(finalBatch))
    val ok = nStream == nBatch && mismatched == 0 && hs == hb
    println(
      s"""{"metric":"stream_parity","events":$nEvents,"profiles_stream":$nStream,""" +
      s""""profiles_batch":$nBatch,"mismatched":$mismatched,""" +
      s""""hash_stream":$hs,"hash_batch":$hb,"batches":$nBatches,""" +
      s""""kill_after":$killAfter,"restarts":$restarts,""" +
      s""""match":$ok,"stream_sec":${jf(streamSec)},"batch_sec":${jf(batchSec)},""" +
      s""""files_per_trigger":$filesPerTrigger,"dir":"$dataDir"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
