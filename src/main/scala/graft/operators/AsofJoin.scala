package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark lacks natively (DuckDB has
  * `ASOF JOIN`, kdb `aj`, pandas `merge_asof`): for every left row, attach
  * the single right row with the largest right-ts <= left-ts (backward
  * direction) for the same key, optionally within a tolerance.
  *
  * Implementation is the scalable union trick, not a join: tag both
  * sides, union them, sort within key by (ts, side) with right rows
  * ordered BEFORE left rows at equal ts (so an exactly-simultaneous right
  * row is visible), and propagate the last-seen right payload with
  * `last(_, ignoreNulls = true)` over an unbounded-preceding row frame.
  * One shuffle on the key, one in-partition sort, zero row explosion —
  * immune to the skew/cardinality blowups of a range self-join, which is
  * why it survives 100 TB while `l JOIN r ON l.ts >= r.ts` (then
  * row_number) does not.
  */
object AsofJoin {

  /** left/right: any DataFrames. keyCols: equi-join keys present in both.
    * rightPayload: columns of `right` to carry (renamed as given).
    * toleranceSec: if >= 0, matches older than leftTs - tolerance become
    * null (no match), mirroring merge_asof's tolerance.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Map[String, String],
               toleranceSec: Long = -1L): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_ats", col(leftTs))
      .withColumn("_rts", lit(null).cast("timestamp"))
    val payloadNulls = rightPayload.values.foldLeft(l) { (df, out) =>
      df.withColumn(s"_p_$out", lit(null).cast(
        right.schema(rightPayload.find(_._2 == out).get._1).dataType))
    }
    var r = right.withColumn("_side", lit(0))
      .withColumn("_ats", col(rightTs))
      .withColumn("_rts", col(rightTs))
    rightPayload.foreach { case (in, out) => r = r.withColumn(s"_p_$out", col(in)) }
    val rSlim = r.select((keyCols ++ Seq("_side", "_ats", "_rts") ++
      rightPayload.values.map(v => s"_p_$v")).map(col): _*)
    val lCols = payloadNulls.columns
    val lSlim = payloadNulls.select(lCols.map(col): _*)

    val unioned = lSlim.unionByName(rSlim, allowMissingColumns = true)
    // right rows sort before left rows at the same ts => inclusive match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightPayload.values.foldLeft(
      unioned.withColumn("_m_ts", last(col("_rts"), ignoreNulls = true).over(w))) {
      (df, out) => df.withColumn(s"_m_$out", last(col(s"_p_$out"), ignoreNulls = true).over(w))
    }
    val matched = filled.filter(col("_side") === 1)
    val withTol =
      if (toleranceSec < 0) matched
      else {
        // materialize the staleness flag FIRST — nulling _m_ts and then
        // re-deriving staleness from it would keep stale payloads
        val flagged = matched.withColumn("_stale",
          col("_m_ts") < col(leftTs) - expr(s"INTERVAL $toleranceSec SECONDS"))
        (Seq("_m_ts") ++ rightPayload.values.map(v => s"_m_$v"))
          .foldLeft(flagged) { (df, c) =>
            df.withColumn(c, when(col("_stale"), lit(null)).otherwise(col(c)))
          }
          .drop("_stale")
      }
    val cleanup = withTol.withColumnRenamed("_m_ts", "asof_ts")
    rightPayload.values.foldLeft(cleanup) { (df, out) =>
      df.withColumnRenamed(s"_m_$out", out)
    }.drop("_side", "_ats", "_rts").drop(rightPayload.values.toSeq.map(v => s"_p_$v"): _*)
  }
}
