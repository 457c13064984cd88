package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric stabilization for oracle-compared float outputs.
  *
  * Spark and the DuckDB oracle accumulate the same doubles in different
  * orders (partial aggregation, window-frame maintenance, closed-form vs
  * sequential EWMA), so results differ in the last few ulps. Rounding to 4
  * decimals absorbs that — except when the true value sits exactly on a
  * `.xxxx5` boundary (common here: integer-valued metrics make half-way
  * decimals), where the two sides flip to different neighbors. Adding a
  * bias far above ulp noise (1e-6) and far below the rounding granularity
  * (5e-5) before rounding moves the boundary off data-reachable values, so
  * both sides round identically. The SAME bias must appear in the oracle
  * SQL: `round(x + 0.000001, 4)` / `floor(x + 0.000001)`.
  */
object Num {
  val Eps = 1e-6

  /** round(x + eps, 4) — use for every float output column. */
  def r4(c: Column): Column = round(c + Eps, 4)

  /** floor(x + eps) — floor's flip is a full unit, so bias is mandatory. */
  def floorB(c: Column): Column = floor(c + Eps)

  /** Oracle-SQL fragments with the matching bias. */
  def r4Sql(expr: String): String = s"round($expr + 0.000001, 4)"
  def floorSql(expr: String): String = s"floor($expr + 0.000001)"
}
