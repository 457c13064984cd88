package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric stabilization for oracle-compared float outputs.
  *
  * Spark and the DuckDB oracle accumulate the same doubles in different
  * orders (partial aggregation, window-frame maintenance, closed-form vs
  * sequential EWMA), so results differ in the last few ulps. Rounding to 4
  * decimals absorbs that — except at `.xxxx5` half-way boundaries, where
  * two hazards bite: (1) the sides' ulp noise flips to different
  * neighbors, and (2) even on IDENTICAL doubles the engines' round()
  * disagrees — Spark rounds the value's shortest DECIMAL repr
  * (BigDecimal.valueOf) HALF_UP while DuckDB rounds the BINARY value, so a
  * double printing as "38.01895" rounds up in Spark but down in DuckDB.
  * The bias must therefore (a) exceed cross-engine noise (~1e-10), and
  * (b) NOT be aligned with the data's decimal grid — a 1e-6 bias maps
  * 6-decimal data exactly ONTO boundaries. 2.5e-7 keeps grid-valued data
  * >= 5e-8 away from every boundary and off boundary-shaped shortest
  * reprs. The SAME bias must appear in the oracle SQL:
  * `round(x + 0.00000025, 4)` / `floor(x + 0.00000025)`.
  */
object Num {
  val Eps = 2.5e-7

  /** round(x + eps, 4) — use for every float output column. */
  def r4(c: Column): Column = round(c + Eps, 4)

  /** JVM twin of `r4` for the partition-local kernels (IVF assignment,
    * PQ encode, kNN offer): BigDecimal.valueOf goes through the shortest
    * decimal repr + HALF_UP, which is what Spark's round() does — THE one
    * implementation; a kernel hand-rolling this can silently fork from
    * the declarative twins on a boundary.
    */
  def r4Jvm(x: Double): Double =
    BigDecimal.valueOf(x + Eps).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** floor(x + eps) — floor's flip is a full unit, so bias is mandatory. */
  def floorB(c: Column): Column = floor(c + Eps)

  /** Oracle-SQL fragments with the matching bias. */
  def r4Sql(expr: String): String = s"round($expr + 0.00000025, 4)"
  def floorSql(expr: String): String = s"floor($expr + 0.00000025)"
}
