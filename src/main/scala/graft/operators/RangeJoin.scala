package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (interval) join.
  *
  * Spark plans a plain `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin or CartesianProduct — the classic scale trap:
  * |points| x |intervals| comparisons. This operator turns it into a
  * shuffle EQUIJOIN: each interval is exploded to the fixed-width buckets
  * it covers, points map to their single bucket, both sides shuffle on
  * (key, bucket), and the exact predicate refines the candidates. Cost is
  * |points| + |intervals| x (span / bucketW + 1) join rows — linear, and
  * AQE handles residual bucket skew like any other equijoin.
  *
  * Contract: values are NON-NEGATIVE (bucketing uses integer `div`, which
  * truncates toward zero) and interval spans are bounded — pick bucketW
  * near the typical span so each interval explodes to O(1) buckets. A
  * point matching several overlapping intervals appears once per match,
  * exactly like the nested-loop semantics it replaces.
  */
object RangeJoin {

  /** `points` (with numeric column `p`) joined to `intervals` (with
    * numeric columns `lo`, `hi`) on equality of `key` and p in [lo, hi].
    * Column sets must not collide beyond `key` (standard join hygiene).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
                   p: String, lo: String, hi: String, bucketW: Long): DataFrame = {
    require(bucketW > 0, "bucketW must be positive")
    // backtick-quote interpolated names (a column called `from` or `a b`
    // must not break the parse) and pick an internal bucket name that
    // cannot clobber a real input column
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    val bucket = TextOps.freshName("__bucket",
      points.columns.toSet ++ intervals.columns)
    val pb = points.withColumn(bucket, expr(s"CAST(${q(p)} AS BIGINT) div $bucketW"))
    val ib = intervals.withColumn(bucket,
      explode(sequence(expr(s"CAST(${q(lo)} AS BIGINT) div $bucketW"),
        expr(s"CAST(${q(hi)} AS BIGINT) div $bucketW"))))
    pb.join(ib, Seq(key, bucket))
      .filter(col(q(p)) >= col(q(lo)) && col(q(p)) <= col(q(hi)))
      .drop(bucket)
  }
}
