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
  * row is visible), and propagate the last-seen right row as ONE struct
  * with `last(_, ignoreNulls = true)` — a single struct, not per-column
  * propagation, so a right row with a NULL payload field still wins as a
  * whole (per-column `last` would stitch the ts from one row and the
  * payload from an older one). One shuffle on the key, one in-partition
  * sort, zero row explosion — immune to the skew/cardinality blowups of a
  * range self-join (`l JOIN r ON l.ts >= r.ts` + row_number), which is
  * why it survives 100 TB.
  *
  * Right rows tying on (key, ts) are resolved deterministically by the
  * packed struct's ordering (largest payload struct wins).
  */
object AsofJoin {

  private val Reserved = Seq("_side", "_ats", "_pk", "asof_ts")

  /** left/right: any DataFrames. keyCols: equi-join keys present in both.
    * rightPayload: columns of `right` to carry, as (inputName -> outputName).
    * toleranceSec: if >= 0, matches older than leftTs - tolerance become
    * null (no match), mirroring merge_asof's tolerance.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Map[String, String],
               toleranceSec: Long = -1L): DataFrame = {
    val outNames = rightPayload.values.toSeq
    require(Reserved.intersect(left.columns).isEmpty,
      s"left side uses reserved column names: ${Reserved.intersect(left.columns).mkString(",")}")
    require(outNames.intersect(left.columns).isEmpty,
      s"payload output names collide with left columns: ${outNames.intersect(left.columns).mkString(",")}")
    // an output named asof_ts would silently overwrite the operator's own
    // match-timestamp column; "ts" would duplicate the packed struct's
    // match-ts field and fail only at analysis time with a cryptic error
    require(Reserved.intersect(outNames).isEmpty && !outNames.contains("ts"),
      s"payload output names collide with the operator's own columns: " +
        (Reserved.intersect(outNames) ++ outNames.filter(_ == "ts")).mkString(","))

    // pack the matched right row into one struct (ts first, then payloads)
    val packed = struct(
      (col(rightTs).as("ts") +:
        rightPayload.toSeq.map { case (in, out) => col(in).as(out) }): _*)
    val rSlim = right
      .select((keyCols.map(col) :+ col(rightTs).as("_ats") :+ packed.as("_pk")): _*)
      .withColumn("_side", lit(0))
    val lSlim = left
      .withColumn("_side", lit(1))
      .withColumn("_ats", col(leftTs))
      .withColumn("_pk", lit(null).cast(rSlim.schema("_pk").dataType))

    val unioned = lSlim.unionByName(rSlim, allowMissingColumns = true)
    // right rows sort before left rows at equal ts => inclusive match;
    // right-vs-right ties resolved by the struct itself (deterministic)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ats").asc, col("_side").asc, col("_pk").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("_m", last(col("_pk"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val withTol =
      if (toleranceSec < 0) matched
      else matched.withColumn("_m",
        when(col("_m.ts") < col(leftTs) - expr(s"INTERVAL $toleranceSec SECONDS"),
          lit(null)).otherwise(col("_m")))
    outNames.foldLeft(withTol.withColumn("asof_ts", col("_m.ts"))) {
      (df, out) => df.withColumn(out, col(s"_m.$out"))
    }.drop("_side", "_ats", "_pk", "_m")
  }
}
