package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join regression: with thresholds scaled down to test size, a
  * join whose shuffle has one dominant key must get its skewed partition
  * split by AQE (the runtime re-plan the engine relies on at 100 TB
  * instead of hand-salting every join).
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // one dominant key (~90% of rows) + a long tail
      val left = spark.range(200000)
        .select(when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id"))).as("k"),
          col("id").as("v"))
      val right = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).toDF("k")
        .withColumn("tag", lit(1))
      val joined = left.join(right, "k").groupBy("tag").agg(count(lit(1)).as("n"))
      val n = joined.collect().map(_.getLong(1)).sum
      assert(n == 180000L + left.filter(col("k").isin((0 until 50).map(i => s"k$i"): _*)).count())
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)") ||
        finalPlan.contains("skew=true"),
        s"AQE did not mark/split the skewed join partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
