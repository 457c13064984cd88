package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY (SPARK_GRAFT_VERIFY_PAR threads, default 6):
  * Spark schedules jobs from multiple driver threads fine, and the dump is
  * dominated by per-query fixed latency, not executor saturation. Cache is
  * cleared once at the end, not per query — clearing mid-flight would
  * yank cached intermediates out from under a running neighbor.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: substring filters — dump only matching queries
    // (local iteration aid; the driver passes exactly two args).
    // "--sql-only" skips every Spark dump and just (re)writes
    // oracle_sql.json — for refreshing oracle TEXT against existing
    // dumps after an evaluation-hint-only SQL change.
    val sqlOnly = args.drop(2).contains("--sql-only")
    val filters = args.drop(2).toSeq.filterNot(_ == "--sql-only")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt
    val spark = Sessions.batch("graft-verify", cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val pool = Executors.newFixedThreadPool(par)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val dumps = (if (sqlOnly) Seq.empty else SparkEntry.queries.toSeq)
      .filter { case (name, _) =>
        filters.isEmpty || filters.exists(name.contains) }
      .map { case (name, fn) =>
      Future {
        // a PRIOR run's dump must not survive a failed query: mode
        // "overwrite" only replaces on success, so without this delete a
        // crash would leave stale parquet in a reused outDir and the
        // correctness compare would silently pass on old results — the
        // failed query must show up as "no spark output"
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(s"$outDir/$name"))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    Await.result(Future.sequence(dumps), Duration.Inf)
    pool.shutdown()
    // drop the shared funnel-stage leaves (managed lifetime), then the
    // session caches
    graft.queries.CurationQueries.releaseStages()
    spark.catalog.clearCache()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def dumpJson(m: Map[String, String], file: String): Unit = {
      val json = m
        .filter { case (k, _) =>
          filters.isEmpty || filters.exists(k.contains) }
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/$file"), json)
    }
    dumpJson(SparkEntry.oracleSql, "oracle_sql.json")
    // stage-decomposed overrides for the materialized-tier gate
    // (check.py --staged) — see QueryDef.staged
    dumpJson(SparkEntry.oracleSqlStaged, "oracle_sql_staged.json")
    spark.stop()
  }
}
