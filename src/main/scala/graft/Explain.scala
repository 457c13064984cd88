package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan and wall time for one registered query —
  * the iterate-on-the-plan loop (push-down present? codegen spans wide?
  * shuffles minimal?).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.batch("graft-explain", 8)
    spark.sparkContext.setLogLevel("WARN")
    // time construction + execution together: iterative operators (e.g.
    // connected components) run jobs eagerly while the DataFrame is built
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    df.explain("formatted")
    // noop sink, not count(): count lets Catalyst column-prune expensive
    // final projections, under-measuring the plan this tool exists to
    // inspect (the same reasoning as Bench's materialization)
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val tExec = (System.nanoTime() - t1) / 1e9
    val n = df.count()
    println(f"rows=$n build=${tBuild}%.2fs exec=${tExec}%.2fs total=${tBuild + tExec}%.2fs")
    spark.stop()
  }
}
