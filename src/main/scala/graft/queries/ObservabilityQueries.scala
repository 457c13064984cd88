package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Num
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-observability operators: windowed heavy hitters (who dominates
  * a time bucket) and column profiling (the data-quality scan run before
  * training ingestion). Both are one-shuffle groupBy programs.
  */
object ObservabilityQueries {

  val defs: Seq[QueryDef] = Seq(

    // Heavy hitters: top-3 users per hour by event count (count desc,
    // user_id asc tie-break). groupBy + rank window — at scale the rank
    // partitions by the hour bucket, so no global sort.
    QueryDef(
      "q_heavy_hitters",
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hour_bucket, user_id,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT hour_bucket, user_id, n,
        |       CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT hour_bucket, user_id, n,
        |         row_number() OVER (
        |           PARTITION BY hour_bucket ORDER BY n DESC, user_id) AS rnk
        |  FROM c)
        |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("hour_bucket"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("hour_bucket")).orderBy(col("n").desc, col("user_id")))
          .cast("int"))
        .filter(col("rnk") <= 3)
    },

    // Column profile over lineitem's numeric measures: row count, nulls,
    // exact distinct, min/max — one grouped pass per column, unioned.
    QueryDef(
      "q_data_profile", {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |       count(*) - count($c) AS n_null,
             |       count(DISTINCT $c) AS n_distinct,
             |       round(CAST(min($c) AS DOUBLE) + 0.00000025, 4) AS min_v,
             |       round(CAST(max($c) AS DOUBLE) + 0.00000025, 4) AS max_v
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n")
      }) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        li.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          Num.r4(min(col(c)).cast("double")).as("min_v"),
          Num.r4(max(col(c)).cast("double")).as("max_v"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_v"), col("max_v"))
      }.reduce(_ unionAll _)
    })
}
