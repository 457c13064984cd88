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
    * schema-adaptive:
    *   - LongType (nanosAsLong legacy read of the NANOS encoding): convert to
    *     a µs TimestampType with integer division — epoch-ns ≈ 1.7e18 exceeds
    *     double's 2^53 mantissa, so `DIV`, never `/`.
    *   - anything else (TIMESTAMP_NTZ / TimestampType): cast to the session
    *     TimestampType. The session TZ is pinned to UTC (Sessions.scala), so
    *     the NTZ→LTZ cast is value-preserving.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
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
