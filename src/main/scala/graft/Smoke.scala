package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-start schema smoke gate.
  *
  * The driver regenerates the testdata between rounds and the physical
  * encoding has drifted before (round 7: events.ts flipped from INT64
  * TIMESTAMP(NANOS) to timestamp[us], silently failing 32 gate queries at
  * analysis time). This gate loads every table through the same typed
  * loaders the queries use, prints the loaded schema, and forces a
  * count + min/max over every column — so a schema drift fails loudly,
  * immediately, and NAMES the table and column, instead of surfacing as
  * missing rows in the driver's correctness artifact.
  *
  * Run standalone (`runMain graft.Smoke [sfDir]`) or implicitly via
  * `SparkEntry.entry`, which the driver smoke-checks at round start.
  */
object Smoke {

  /** Orderable atomic types get min/max; everything else (arrays, maps,
    * structs) gets a non-null count, which still forces a full decode of
    * the column through the parquet reader.
    */
  private def probes(field: StructField): Seq[org.apache.spark.sql.Column] =
    field.dataType match {
      case _: NumericType | StringType | BinaryType | BooleanType |
          DateType | TimestampType | TimestampNTZType =>
        Seq(min(col(field.name)), max(col(field.name)))
      case _ =>
        Seq(count(col(field.name)))
    }

  /** Loads and fully probes one table; throws IllegalStateException naming
    * the table on any analysis or execution failure. Returns a one-line
    * summary (table, row count, schema).
    */
  def checkTable(spark: SparkSession, sfDir: String, table: String): String = {
    val df: DataFrame =
      try Tables.loaderFor(table)(spark, sfDir)
      catch {
        case e: Exception =>
          throw new IllegalStateException(
            s"SMOKE FAIL [$table] load error at $sfDir: ${e.getMessage}", e)
      }
    val schemaLine = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
    try {
      val agg = df.agg(count(lit(1)).as("n"),
        df.schema.fields.flatMap(probes): _*)
      val n = agg.collect()(0).getLong(0)
      if (n <= 0)
        throw new IllegalStateException(s"SMOKE FAIL [$table] empty at $sfDir")
      s"smoke ok [$table] rows=$n schema={$schemaLine}"
    } catch {
      case e: IllegalStateException => throw e
      case e: Exception =>
        throw new IllegalStateException(
          s"SMOKE FAIL [$table] probe error (schema={$schemaLine}): ${e.getMessage}", e)
    }
  }

  /** Probes every table in Tables.names; prints and returns the summaries. */
  def check(spark: SparkSession, sfDir: String): Seq[String] = {
    val lines = Tables.names.map(checkTable(spark, sfDir, _))
    lines.foreach(println)
    lines
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.batch("graft-smoke", 8)
    try check(spark, sfDir)
    finally spark.stop()
  }
}
