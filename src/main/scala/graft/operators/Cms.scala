package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch.
  *
  * The frequency-estimation complement to the [[Hll]] distinct sketch:
  * a depth x width table of integer counters where row r hashes value x
  * to column hash_r(x) and a point estimate is the MIN over rows of the
  * addressed counters (Cormode-Muthukrishnan 2005). Always an
  * OVERestimate (collisions only add), with error <= 2N/width at
  * probability 1 - 2^-depth.
  *
  * Everything is integer-exact and cross-engine reproducible: the row
  * hash is the repo's shared 60-bit md5-prefix (`TextOps.hash64`) of
  * `value || '#' || row`, registers are plain counts, and the estimate is
  * an integer min — so unlike Spark's built-in CountMinSketch aggregate
  * (implementation-defined hashing, not replayable in another engine) the
  * whole sketch is oracle-gated hash-exact.
  *
  * Why it matters at 100 TB: the register table is a constant
  * Depth x Width integers per group regardless of input rows, built by
  * one map-side-combinable groupBy (the explode to Depth rows happens
  * map-side and collapses to <= Depth x Width partial rows per task
  * before the shuffle). Sketches are LINEAR: element-wise SUM merges
  * daily/partition sketches into totals (deletions subtract), so
  * frequency tables for billions of keys ship as a few KB, and point
  * lookups broadcast the sketch to wherever the probes live.
  */
object Cms {

  val Depth = 4
  val Width = 512

  /** Column of row indexes 0..Depth-1 to explode per input row. */
  private def rows: Column = array((0 until Depth).map(lit): _*)

  /** bucket_r(x) = hash64(x || '#' || r) % Width — independent-enough row
    * hashes from one base hash by salting with the row index.
    */
  def bucket(value: Column, r: Column): Column =
    TextOps.hash64(concat(value, lit("#"), r.cast("string"))) % Width

  def bucketSql(valueExpr: String, rExpr: String): String =
    s"${TextOps.hash64Sql(s"($valueExpr) || '#' || CAST($rExpr AS VARCHAR)")} % $Width"

  /** Register table (r, c, cnt): one row per touched counter, absent
    * counters are zero. Merge sketches by summing cnt on (r, c).
    */
  def registers(df: DataFrame, value: Column): DataFrame =
    df.select(value.cast("string").as("v"), explode(rows).as("r"))
      .groupBy(col("r"), bucket(col("v"), col("r")).as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** The register table as DuckDB SQL over `from`; `valueExpr` must
    * already be VARCHAR. Mirrors [[registers]] exactly.
    */
  def registersSql(valueExpr: String, from: String): String =
    s"""SELECT r, ${bucketSql(valueExpr, "r")} AS c, count(*) AS cnt
       |FROM $from CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) rows
       |GROUP BY 1, 2""".stripMargin

  /** Point estimates for `probes` (a DataFrame with a `v` string column,
    * any other columns carried through): min over rows of the addressed
    * counters. Probes drawn from the sketched data always hit all Depth
    * counters; a never-seen probe would miss rows entirely, so absent
    * counters are restored as 0 via the left join + coalesce.
    * The register table is Depth x Width rows -> broadcast the build side;
    * no shuffle of the probe stream beyond its own groupBy.
    */
  def estimate(regs: DataFrame, probes: DataFrame): DataFrame = {
    val carried = probes.columns.filter(_ != "v").toSeq
    probes.select((col("v") +: carried.map(col)) :+ explode(rows).as("r"): _*)
      .withColumn("c", bucket(col("v"), col("r")))
      .join(broadcast(regs), Seq("r", "c"), "left")
      .groupBy((col("v") +: carried.map(col)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
