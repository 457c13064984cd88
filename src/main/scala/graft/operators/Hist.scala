package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic histogram quantile sketch.
  *
  * Completes the sketch family ([[Hll]] distinct, [[Cms]] frequency,
  * [[Bloom]] membership) with quantiles. t-digest/KLL give
  * implementation-defined centroids that can't be replayed in another
  * engine, so — like the others — this trades a little accuracy for full
  * determinism: values land in fixed power-of-two-width buckets
  * (integer cents shifted right, never float log or division), and the
  * p-th percentile is the lower bound of the first bucket whose running
  * count reaches the integer rank target (cum * 100 >= p * total — no
  * ceil, no float anywhere). Error is bounded by one bucket width.
  *
  * Histograms are linear: tables SUM-merge on (group, bucket), so daily
  * histograms compose into monthly quantiles without re-reading data —
  * the property exact percentiles fundamentally lack (a 100 TB exact p99
  * needs a global sort; this needs one map-side-combinable groupBy into
  * a bounded table, then a per-group cumulative scan over at most
  * range/width rows).
  *
  * Contract: values are NON-NEGATIVE (integer shift bucketing), range /
  * bucket width is the per-group state bound — pick [[BucketBits]] for
  * the precision/size trade.
  */
object Hist {

  /** 2^9 cents = 5.12-value-unit buckets. */
  val BucketBits = 9

  /** The bucket layout — public so sketch consumers (e.g. the quantile
    * length filter) recompute a value's bucket with the ONE definition.
    */
  def bucket(value: Column): Column =
    shiftright(floor(value * 100).cast("long"), BucketBits)

  def bucketSql(valueExpr: String): String =
    s"CAST(floor(($valueExpr) * 100) AS BIGINT) >> $BucketBits"

  /** Bucket counts (groupCols..., b, n): the register table. Merge
    * histograms by summing n on (groupCols..., b). groupCols must be
    * non-empty: an ungrouped histogram would fold through a single
    * partition in [[quantiles]] — wrap the input with a constant group
    * column if one global histogram is genuinely wanted.
    */
  def buckets(df: DataFrame, value: Column, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.select((groupCols.map(col) :+ bucket(value).as("b")): _*)
      .groupBy((groupCols :+ "b").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  def bucketsSql(valueExpr: String, groupCols: Seq[String], from: String): String = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val g = groupCols.mkString(", ")
    s"""SELECT $g, ${bucketSql(valueExpr)} AS b, count(*) AS n
       |FROM $from GROUP BY $g, ${bucketSql(valueExpr)}""".stripMargin
  }

  /** Per-group lower-bound-cents estimates for the given integer
    * percentiles: the first bucket whose cumulative count reaches the
    * rank target. The window partitions by the group — no global sort.
    * Internal window columns are picked collision-free against `h`.
    */
  def quantiles(h: DataFrame, groupCols: Seq[String], percents: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val taken = h.columns.toSet
    val cum = graft.operators.TextOps.freshName("__cum", taken)
    val total = graft.operators.TextOps.freshName("__total", taken)
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("b"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val aggs = percents.map { p =>
      (min(when(col(cum) * 100 >= col(total) * p, col("b")))
        * (1L << BucketBits)).as(s"p${p}_cents")
    }
    h.withColumn(cum, sum(col("n")).over(wCum))
      .withColumn(total, sum(col("n")).over(wAll))
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The quantile fold as DuckDB SQL over a relation `h` with columns
    * (grp, b, n) — SELECT grp, p<P>_cents per requested percentile.
    */
  def quantilesSql(percents: Seq[Int]): String = {
    val sels = percents.map(p =>
      s"min(CASE WHEN cum * 100 >= total * $p THEN b END) << $BucketBits AS p${p}_cents")
      .mkString(",\n       ")
    s"""SELECT grp,
       |       $sels
       |FROM (
       |  SELECT grp, b,
       |         sum(n) OVER (PARTITION BY grp ORDER BY b) AS cum,
       |         sum(n) OVER (PARTITION BY grp) AS total
       |  FROM h)
       |GROUP BY grp""".stripMargin
  }
}
