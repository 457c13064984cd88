package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Every loader takes the scale-factor directory so the same query code runs
  * at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench). At cluster
  * scale the same call reads a partitioned table from object storage — the
  * parquet reader prunes columns and pushes filters down, so queries should
  * always `select` only what they need and filter as early as possible.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** events.parquet has shipped `ts` as either INT64 TIMESTAMP(NANOS) or
    * plain timestamp[us] across testdata generations, so the loader is
    * schema-adaptive. The NANOS case is detected from the parquet FOOTER,
    * not from the arrival type: a first read with nanosAsLong=false throws
    * on a TIMESTAMP(NANOS) annotation (that IS the footer evidence), while
    * a plain un-annotated INT64 `ts` arrives as LongType either way — for
    * that ambiguous case the unit is decided by MAGNITUDE (epoch-ns ≈
    * 1.8e18, -µs ≈ 1.8e15, -ms ≈ 1.8e12, -s ≈ 1.8e9; one bounded max(abs)
    * action), never silently assumed, because a wrong assumption scales
    * every timestamp 1000×.
    *   - NANOS (footer-annotated): legacy LongType read, then integer
    *     division to µs — epoch-ns exceeds double's 2^53 mantissa, so
    *     `DIV`, never `/`.
    *   - anything else (TIMESTAMP_NTZ / TimestampType): cast to the session
    *     TimestampType. The session TZ is pinned to UTC (Sessions.scala), so
    *     the NTZ→LTZ cast is value-preserving.
    */
  /** Resolved ts strategy per sfDir, so the footer probe and (for the
    * un-annotated INT64 case) the max(abs) magnitude job run ONCE per
    * table directory, not on every `events` call — Bench/Verify load the
    * table per query and the probe was a full-table Spark job each time.
    */
  private sealed trait TsUnit
  private case object TsNative extends TsUnit           // timestamp-typed
  private case object TsNanosFooter extends TsUnit      // INT64 TIMESTAMP(NANOS)
  private final case class TsInt64(divToMicros: String) extends TsUnit
  private val tsUnits = new java.util.concurrent.ConcurrentHashMap[String, TsUnit]()

  def events(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    // synchronized: Verify loads tables from several threads, and the
    // footer probe below toggles a session-level conf around the read
    val unit = tsUnits.computeIfAbsent(sfDir, _ => {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      scala.util.Try { val d = load(spark, sfDir, "events"); d.schema; d } match {
        case scala.util.Success(df) =>
          df.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              // un-annotated INT64: decide the epoch unit by magnitude
              val row = df.select(max(abs(col("ts")))).head
              if (row.isNullAt(0)) throw new IllegalStateException(
                s"events.ts in $sfDir is INT64 but the table is empty or " +
                  "all-null — cannot infer the epoch unit")
              val m = row.getLong(0)
              if (m > 1e17) TsInt64("ts DIV 1000")            // nanoseconds
              else if (m > 1e14) TsInt64("ts")                // microseconds
              else if (m > 1e11) TsInt64("ts * 1000")         // milliseconds
              else if (m > 1e8) TsInt64("ts * 1000000")       // seconds
              else throw new IllegalStateException(
                s"events.ts is INT64 with max |ts| = $m — not a plausible " +
                  "epoch in s/ms/us/ns; refusing to guess the unit")
            case _ => TsNative
          }
        // Only an exception that actually NAMES the NANOS annotation is
        // footer evidence — treating ANY first-read failure as NANOS
        // would, after a transient FS error on a plain-µs table, cache a
        // silent 1000× timestamp scaling (the exact corruption this
        // probe exists to refuse). Anything else propagates.
        case scala.util.Failure(e) =>
          def msgs(t: Throwable): Seq[String] =
            if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
          if (msgs(e).exists(m => m.contains("NANOS") || m.contains("nanosAsLong")))
            TsNanosFooter
          else throw e
      }
    })
    unit match {
      case TsNative =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        load(spark, sfDir, "events").withColumn("ts", col("ts").cast("timestamp"))
      case TsInt64(div) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        load(spark, sfDir, "events").withColumn("ts", timestamp_micros(expr(div)))
      case TsNanosFooter =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        load(spark, sfDir, "events")
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    }
  }

  /** Apply the same adaptive ts conversion `events` resolves for `sfDir`
    * to an arbitrary events-schema DataFrame — the STREAMING twin:
    * StreamParity's file source reads `events.parquet` raw, and without
    * this an INT64 (s/ms/µs/ns) or NANOS-annotated table would flow
    * unconverted longs into the pipeline's timestamp column. Call
    * `events` (or this, on any batch frame) once first so the unit probe
    * has run batch-side; the probe itself cannot run on a streaming frame
    * (it needs a max(abs) job), so an unprobed dir fails fast here rather
    * than guessing. For TsNanosFooter dirs the caller's stream read must
    * already happen under `nanosAsLong=true` — `events` leaves the
    * session conf in that state when it resolves the unit.
    */
  def normalizeEventsTs(sfDir: String, df: DataFrame): DataFrame =
    tsUnits.get(sfDir) match {
      case TsNative       => df.withColumn("ts", col("ts").cast("timestamp"))
      case TsInt64(div)   => df.withColumn("ts", timestamp_micros(expr(div)))
      case TsNanosFooter  => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case null => throw new IllegalStateException(
        s"events ts unit for $sfDir not probed yet — call Tables.events " +
          "on the dir (batch) before normalizing a streaming frame")
    }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Name → the typed loader queries actually use (events goes through the
    * schema-adaptive ts conversion, everything else is a plain read).
    */
  def loaderFor(table: String): (SparkSession, String) => DataFrame = table match {
    case "events" => events
    case other    => (s, dir) => load(s, dir, other)
  }
}
