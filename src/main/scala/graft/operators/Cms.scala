package graft.operators

import org.apache.spark.sql.DataFrame
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
  * hash is the shared salted-bucket layout (`TextOps.saltedBucket` — the
  * single source of truth [[Bloom]] also uses) and registers are plain
  * counts, so unlike Spark's built-in CountMinSketch aggregate
  * (implementation-defined hashing, not replayable in another engine) the
  * whole sketch is oracle-gated hash-exact.
  *
  * Why it matters at 100 TB: the register table is a constant
  * Depth x Width integers per group regardless of input rows, built by
  * one map-side-combinable groupBy (the explode to Depth rows happens
  * map-side and collapses to <= Depth x Width partial rows per task
  * before the shuffle). Sketches are LINEAR: element-wise SUM merges
  * daily/partition sketches into totals (deletions subtract), so
  * frequency tables for billions of keys ship as ~2K counters (~16 KB),
  * and point lookups broadcast the sketch to wherever the probes live.
  */
object Cms {

  val Depth = 4
  val Width = 512

  /** Salt values 0..Depth-1, exploded per input row (Spark side). */
  private def salts = array((0 until Depth).map(lit): _*)

  /** The salt relation for DuckDB SQL twins — derived from Depth so the
    * two engines cannot drift.
    */
  val saltsSql: String =
    s"(SELECT unnest([${(0 until Depth).mkString(", ")}]) AS r) rows"

  def bucketSql(valueExpr: String, rExpr: String): String =
    TextOps.saltedBucketSql(valueExpr, rExpr, Width)

  /** Register table (r, c, cnt): one row per touched counter, absent
    * counters are zero. Merge sketches by summing cnt on (r, c).
    */
  def registers(df: DataFrame, value: org.apache.spark.sql.Column): DataFrame =
    df.select(value.cast("string").as("v"), explode(salts).as("r"))
      .groupBy(col("r"), TextOps.saltedBucket(col("v"), col("r"), Width).as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** The register table as DuckDB SQL over `from`; `valueExpr` must
    * already be VARCHAR. Mirrors [[registers]] exactly.
    */
  def registersSql(valueExpr: String, from: String): String =
    s"""SELECT r, ${bucketSql(valueExpr, "r")} AS c, count(*) AS cnt
       |FROM $from CROSS JOIN $saltsSql
       |GROUP BY 1, 2""".stripMargin

  /** Point estimates for `probes` (a DataFrame with a `v` string column,
    * any other columns carried through — but not one named `est`): min
    * over rows of the addressed counters, absent counters restored as 0
    * via the left join + coalesce. Internal join columns are picked
    * collision-free against the probe schema. The register table is
    * Depth x Width rows -> broadcast; no shuffle beyond the probes' own
    * groupBy.
    */
  def estimate(regs: DataFrame, probes: DataFrame): DataFrame = {
    require(!probes.columns.contains("est"), "probes must not carry 'est'")
    val carried = probes.columns.filter(_ != "v").toSeq
    val taken = probes.columns.toSet
    val rc = TextOps.freshName("__r", taken)
    val cc = TextOps.freshName("__c", taken)
    val nc = TextOps.freshName("__cnt", taken)
    val regs2 = regs.select(col("r").as(rc), col("c").as(cc), col("cnt").as(nc))
    probes.select((col("v") +: carried.map(col)) :+ explode(salts).as(rc): _*)
      .withColumn(cc, TextOps.saltedBucket(col("v"), col(rc), Width))
      .join(broadcast(regs2), Seq(rc, cc), "left")
      .groupBy((col("v") +: carried.map(col)): _*)
      .agg(min(coalesce(col(nc), lit(0L))).as("est"))
  }
}
