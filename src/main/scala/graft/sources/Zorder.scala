package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-column scan locality — the
  * standard lakehouse answer (Delta/Iceberg OPTIMIZE ZORDER) to "queries
  * filter on several columns, but files can only be range-clustered on
  * one sort key". Interleaving the bits of per-column bucket indices
  * makes rows close in EVERY dimension land in the same files, so a
  * multi-column box predicate touches a small, contiguous set of files
  * (and parquet row-group min/max stats skip the rest) instead of every
  * file in the table. ZorderSpec demonstrates the concentration against
  * a single-column range layout.
  *
  * Bucketing here is linear min/max scaling computed in one aggregation
  * pass — deterministic, which the specs need. Skew-robust production
  * variants substitute rank-based boundaries (approxQuantile) per
  * column; the interleave and write path are unchanged.
  */
object Zorder {

  /** Per-column bucket index in [0, 2^bits): linear scaling of the value
    * between the column's min and max (1-row broadcast join; NULLs and
    * degenerate min==max columns go to bucket 0).
    */
  def withBuckets(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val n = 1L << bits
    cols.foldLeft(df.crossJoin(broadcast(bounds))) { (d, c) =>
      val mn = col(s"__mn_$c"); val mx = col(s"__mx_$c")
      val scaled = floor(
        (col(c).cast("double") - mn) / (mx - mn) * n.toDouble).cast("long")
      d.withColumn(s"__b_$c",
        when(col(c).isNull || mx <= mn, 0L)
          .otherwise(least(greatest(scaled, lit(0L)), lit(n - 1))))
    }.drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Morton interleave of k bucket columns of `bits` bits each: output
    * bit (i*k + j) is bit i of bucket column j. Built as a sum of
    * bit-extract * 2^position terms — plain codegen'd long arithmetic,
    * k*bits terms.
    */
  def zvalue(bucketCols: Seq[Column], bits: Int): Column = {
    val k = bucketCols.size
    // Long shifts wrap mod 64: k*bits > 63 would silently produce
    // colliding z-values (a meaningless clustering), so fail loudly
    require(k * bits <= 63,
      s"zvalue needs ${k * bits} bits ($k cols x $bits) but a Long holds 63; " +
        "lower bits or drop columns")
    (0 until bits).flatMap { i =>
      bucketCols.zipWithIndex.map { case (b, j) =>
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (i * k + j))
      }
    }.reduce(_ + _)
  }

  /** Write `df` to parquet in `numFiles` files range-clustered on the
    * Morton code of `cols` (each file owns a contiguous z-range, sorted
    * within so parquet row-group stats are tight on the z-dimensions).
    * The helper columns never reach the files.
    */
  def write(df: DataFrame, path: String, cols: Seq[String], bits: Int,
            numFiles: Int): Unit = {
    val withZ = withBuckets(df, cols, bits)
      .withColumn("__z", zvalue(cols.map(c => col(s"__b_$c")), bits))
    withZ
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(df.columns.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}
