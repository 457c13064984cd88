package graft

import org.apache.spark.sql.functions._

/** Storage-layout guard #2 (with BucketingSpec): a table written
  * partitioned by day answers a day-filtered query by reading ONLY the
  * matching partition directories — at 100 TB this is the difference
  * between scanning terabytes and scanning one day.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + day filter prunes to one partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (0 until 30).flatMap(d => (0 until 100).map(i => (s"2024-01-${"%02d".format(d + 1)}", i.toLong)))
      .toDF("day", "v")
      .write.partitionBy("day").parquet(s"$dir/events_by_day")

    val q = spark.read.parquet(s"$dir/events_by_day")
      .filter(col("day") === "2024-01-15")
      .agg(sum("v").as("s"))
    assert(q.collect().head.getLong(0) == (0 until 100).sum.toLong)
    val plan = q.queryExecution.executedPlan.toString
    // the partition filter must reach the scan as PartitionFilters, and
    // the files read must be the single day's
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-15"),
      s"day filter did not become a partition filter:\n$plan")
    // and the files actually read are exclusively the matching day's
    val files = spark.read.parquet(s"$dir/events_by_day")
      .filter(col("day") === "2024-01-15")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("day=2024-01-15")),
      s"read outside the pruned partition: ${files.mkString(", ")}")
  }
}
