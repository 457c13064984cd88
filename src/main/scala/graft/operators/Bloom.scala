package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter.
  *
  * The membership sketch completing the family ([[Hll]] distinct, [[Cms]]
  * frequency): K row-salted hashes of the repo's shared 60-bit md5-prefix
  * set bits in an M-bit array; a probe "might be present" iff all K of
  * its bits are set. NO false negatives ever — which is what makes the
  * filter a correctness-preserving pre-join: dropping probe rows whose
  * bits miss can only drop rows the exact join would not have matched.
  *
  * Like the other sketches, everything is integer-exact and cross-engine:
  * the bit array is materialized as the DISTINCT set of positions (a
  * relation, not a packed bitmap), so the DuckDB oracle replays it
  * hash-for-hash, and filters union-merge by unioning their position sets
  * (bloom(A) OR bloom(B) = bloom(A union B) exactly).
  *
  * Why it matters at 100 TB: the build side collapses to at most M small
  * integers no matter how many rows fed it — build it once from the
  * 80 TB train split, broadcast the few-hundred-KB position set, and
  * pre-filter the probe stream map-side BEFORE its shuffle (the
  * `q_train_eval_contamination` comment's "bloom-filtered build side"
  * made concrete). Only the ~FP-rate fraction of true negatives survives
  * to the exact join, so shuffle volume tracks matches, not corpus size.
  */
object Bloom {

  /** 2^16 bits; at n distinct keys the FP rate is (1 - e^(-Kn/M))^K —
    * ~3% at n = 10k. Size M to the build side's distinct count in real
    * deployments; fixed here so the oracle is stable across SFs.
    */
  val MBits = 1 << 16
  val K = 3

  private def hashes: Column = array((0 until K).map(lit): _*)

  private def pos(value: Column, j: Column): Column =
    TextOps.hash64(concat(value, lit("#"), j.cast("string"))) % MBits

  def posSql(valueExpr: String, jExpr: String): String =
    s"${TextOps.hash64Sql(s"($valueExpr) || '#' || CAST($jExpr AS VARCHAR)")} % $MBits"

  /** The filter: the distinct set-bit positions of `value` over `df`.
    * Bounded by MBits rows regardless of input size; merge filters by
    * `union.distinct`.
    */
  def bits(df: DataFrame, value: Column): DataFrame =
    df.select(value.cast("string").as("v"), explode(hashes).as("j"))
      .select(pos(col("v"), col("j")).as("pos"))
      .distinct()

  /** The filter as DuckDB SQL over `from`; `valueExpr` must be VARCHAR. */
  def bitsSql(valueExpr: String, from: String): String =
    s"""SELECT DISTINCT ${posSql(valueExpr, "j")} AS pos
       |FROM $from CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) js""".stripMargin

  /** Probes (`v` string column, other columns carried) annotated with
    * `maybe`: true iff all K bit positions are set. The position set is
    * <= MBits rows -> broadcast; the probe stream never shuffles here
    * (its groupBy keys are its own rows, resolved map-side by the
    * partial aggregation).
    */
  def mightContain(bits: DataFrame, probes: DataFrame): DataFrame = {
    val carried = probes.columns.filter(_ != "v").toSeq
    probes.select((col("v") +: carried.map(col)) :+ explode(hashes).as("j"): _*)
      .withColumn("pos", pos(col("v"), col("j")))
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy((col("v") +: carried.map(col)): _*)
      // hits == exploded rows (not == K): a probe key duplicated in the
      // input still reads all-bits-set correctly
      .agg((count(col("hit")) === count(lit(1))).as("maybe"))
  }
}
