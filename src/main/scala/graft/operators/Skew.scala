package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A hot key that would
  * overload one reducer is split across `salts` sub-partitions (phase 1 =
  * partial agg on (key, salt)), then combined (phase 2 = final agg on
  * key). Results are identical to the direct aggregation for any
  * decomposable aggregate; the salt is a deterministic hash of arbitrary
  * spread columns, so no RNG and no reshuffle ambiguity.
  *
  * AQE's skew-join handling covers joins; this covers aggregations whose
  * partial/final decomposition Spark cannot re-balance on its own when a
  * single group dwarfs the rest.
  */
object Skew {

  /** count + sum per key, salted. `spread` should be a high-cardinality
    * column (event id, offset) so the hot key splits evenly.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     spread: Column, salts: Int): DataFrame =
    df.groupBy(key.as("key"), (pmod(xxhash64(spread), lit(salts))).as("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(value).as("_sum"))
      .groupBy(col("key"))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("sum"))
}
