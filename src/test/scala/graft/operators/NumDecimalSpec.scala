package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DECIMAL(38,0) money-accumulator swap (Num.centsDec): synthetic
  * rows push the cent-sum past int64's ~9.2e18 headroom, the long path
  * fails loudly (ANSI) or wraps to a wrong value, and the widened path
  * produces the exact BigInt — the contract `Num.cents`'s scaladoc
  * documents for true-100 TB magnitudes. The cross-engine half of the
  * proof (Spark DECIMAL vs DuckDB HUGEINT bit-identical through the
  * string form) is q_money_decimal_sum's hash gate.
  */
class NumDecimalSpec extends SparkSpec {
  import spark.implicits._

  // 11 rows x 87654321.99 money x 1e9 scale: per-row scaled cents
  // 8.765432199e18 still fits int64 (the overflow must happen in the
  // SUM, where the swap lives, not in the row projection), while the
  // total 9.64e19 exceeds int64 by 10x
  private val Rows = 11
  private val Money = 87654321.99
  private val CentsPerRow = BigInt("8765432199")
  private val Scale = 1000000000L
  private def df = (1 to Rows).map(_ => Money).toDF("amount")

  test("the int64 cent path cannot carry the accumulated magnitude") {
    val longSum =
      try Some(df.agg(sum(Num.cents(col("amount")) * lit(Scale)))
        .collect()(0).getLong(0))
      catch { case _: Throwable => None } // ANSI: overflow throws
    val exact = CentsPerRow * Scale * Rows
    assert(exact > BigInt(Long.MaxValue), "precondition: sum exceeds int64")
    // either loud failure (ANSI, the shipped default) or a wrapped value
    // that diverges from the exact sum — never a silently-correct int64
    longSum.foreach(v => assert(BigInt(v) != exact))
  }

  test("the DECIMAL(38,0) path is integer-exact past int64") {
    val got = df.agg(sum(Num.centsDec(col("amount")) * lit(Scale))
      .cast("string")).collect()(0).getString(0)
    assert(BigInt(got) == CentsPerRow * Scale * Rows)
  }

  test("per-row widening keeps the cent grid: cents and centsDec agree in-range") {
    val rows = df.select(Num.cents(col("amount")).as("l"),
      Num.centsDec(col("amount")).cast("string").as("d")).collect()
    rows.foreach(r => assert(BigInt(r.getLong(0)) == BigInt(r.getString(1))))
  }
}
