package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on a skewed key") {
    import spark.implicits._
    // one hot key (90% of rows) + long tail
    val df = spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id"))).as("key"),
        (col("id") % 7).cast("double").as("v"),
        col("id").as("spread"))
    val direct = df.groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(df, col("key"), col("v"), col("spread"), salts = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
