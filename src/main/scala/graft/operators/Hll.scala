package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct sketch.
  *
  * Spark's own `approx_count_distinct` (HLL++) gives estimates that can't
  * be reproduced engine-for-engine, so it can't be oracle-gated. This
  * operator builds the classic HLL register table from the repo's shared
  * 60-bit md5-prefix hash so that EVERY intermediate is integer-exact and
  * identical in Spark and DuckDB:
  *
  *   h       = hash64(value)            60-bit, cross-engine (TextOps)
  *   bucket  = h % 256                  256 registers
  *   w       = h >> 8                   52 usable bits (integer shift,
  *                                      never `/`: both engines make `/`
  *                                      a double division)
  *   rho(w)  = 1 + trailing zero bits   via an integer CASE chain — no
  *             (capped at 53 for w = 0) log2/float anywhere
  *   M_b     = max(rho)                 the register; merge = max, so
  *                                      partial (map-side) aggregation and
  *                                      cross-partition merge are exact and
  *                                      order-independent
  *
  * The estimate avoids float-summation order entirely: registers fold as
  * the INTEGER sum(1 << (53 - M_b)) (each term a power of two, total
  * <= 256 * 2^53 < 2^63), absent registers contributing 1 << 53 each; the
  * only float ops are one division and one log at the end, on identical
  * operands in both engines, rounded through Num.r4 at the query layer.
  *
  * Why it matters at 100 TB: the register table for ANY group is <= 256
  * small integers — a distinct-count over billions of rows becomes one
  * map-side-combinable groupBy with constant-size state per group,
  * mergeable across days/partitions/clusters by element-wise max (so
  * daily register tables compose into monthly counts without re-reading
  * data). Standard HLL with the linear-counting small-range correction
  * (Flajolet-Fusy-Gandouet-Meunier 2007).
  */
object Hll {

  val Buckets = 256
  private val BucketBits = 8
  /** Bit width of w = h >> 8 when h is the 60-bit hash64. */
  val WBits = 52

  /** rho = 1 + count of trailing zero bits of `w`; w == 0 (all 52 bits
    * zero) caps at WBits + 1. Pure integer comparisons, exact in any
    * engine: w % 2^k == 2^(k-1)  <=>  exactly k-1 trailing zeros.
    */
  def rho(w: Column): Column = {
    val arms = (1 to WBits).map(k =>
      when(w % lit(1L << k) === lit(1L << (k - 1)), lit(k)))
    coalesce((arms :+ lit(WBits + 1).cast("int")): _*)
  }

  /** The same chain as DuckDB SQL (generated, so the two can't drift). */
  def rhoSql(w: String): String =
    (1 to WBits)
      .map(k => s"WHEN ($w) % ${1L << k} = ${1L << (k - 1)} THEN $k")
      .mkString("CASE ", " ", s" ELSE ${WBits + 1} END")

  /** Register table: one row per (group, bucket) observed —
    * (groupCols..., bucket, m). Integer-exact and hash-green against the
    * mirrored SQL; register tables union-merge with max(m).
    */
  def registers(df: DataFrame, value: Column, groupCols: Seq[String]): DataFrame = {
    val h = TextOps.hash64(value.cast("string"))
    df.select((groupCols.map(col) :+ (h % Buckets).as("bucket") :+
        rho(shiftright(h, BucketBits)).as("r")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).cast("long").as("m"))
  }

  /** The register table as DuckDB SQL: SELECT body over `from` producing
    * (groupCols..., bucket, m); `valueExpr` must already be VARCHAR.
    */
  def registersSql(valueExpr: String, groupCols: Seq[String], from: String): String = {
    val g = groupCols.mkString(", ")
    s"""SELECT $g, h % $Buckets AS bucket,
       |       CAST(max(${rhoSql(s"h >> $BucketBits")}) AS BIGINT) AS m
       |FROM (SELECT $g, ${TextOps.hash64Sql(valueExpr)} AS h FROM $from)
       |GROUP BY $g, h % $Buckets""".stripMargin
  }

  /** Fold a register table into the HLL estimate per group: alpha * m^2 /
    * sum(2^-M) with absent buckets at M = 0, via the integer register sum
    * 2^53 * sum(2^-M); linear counting below 2.5m while empty registers
    * remain. Output: (groupCols..., est: double) — round at the caller.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / Buckets)
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("nb"), // observed buckets
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))")).as("sObs"))
      .withColumn("sInt",
        col("sObs") + (lit(Buckets.toLong) - col("nb")) * lit(1L << 53))
      .withColumn("zeros", lit(Buckets.toLong) - col("nb"))
      .withColumn("raw",
        lit(alpha * Buckets * Buckets) * lit((1L << 53).toDouble) / col("sInt"))
      .withColumn("est",
        when(col("raw") < lit(2.5 * Buckets) && col("zeros") > 0,
          lit(Buckets.toDouble) * log(lit(Buckets.toDouble) / col("zeros")))
          .otherwise(col("raw")))
      .drop("nb", "sObs", "sInt", "zeros", "raw")
  }

  /** The estimate as DuckDB SQL over a relation `rel` with columns
    * (grp, bucket, m): SELECT grp, est. Decimal literals are cast to
    * DOUBLE explicitly — DuckDB parses them as DECIMAL, whose arithmetic
    * would diverge from Spark's double math.
    */
  def estimateSqlOver(rel: String): String = {
    val two53 = 1L << 53
    s"""SELECT grp,
       |       CASE WHEN raw < CAST(2.5 AS DOUBLE) * $Buckets AND zeros > 0
       |            THEN CAST($Buckets AS DOUBLE) * ln(CAST($Buckets AS DOUBLE) / zeros)
       |            ELSE raw END AS est
       |FROM (
       |  SELECT grp,
       |         (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / $Buckets))
       |           * $Buckets * $Buckets * CAST($two53 AS DOUBLE)
       |           / (sObs + ($Buckets - nb) * CAST($two53 AS BIGINT)) AS raw,
       |         $Buckets - nb AS zeros
       |  FROM (SELECT grp, count(*) AS nb,
       |               sum(CAST(1 AS BIGINT) << (53 - CAST(m AS INTEGER))) AS sObs
       |        FROM $rel GROUP BY grp))""".stripMargin
  }

  /** The estimate over the conventional CTE name `regs`. */
  val estimateSql: String = estimateSqlOver("regs")
}
