package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Storage-layout guard #3 (with BucketingSpec / PartitionPruningSpec):
  * Z-ordering concentrates a multi-column box predicate's matching rows
  * into few files, where a single-column range layout spreads them over
  * every file. At 100 TB that concentration is what parquet row-group
  * min/max skipping converts into IO savings.
  */
class ZorderSpec extends SparkSpec {

  test("morton interleave is the textbook bit-weave") {
    import spark.implicits._
    // (x=0b101, y=0b011) with 3 bits -> z bits (y2 x2 y1 x1 y0 x0)
    //  = 0b011011 -> wait, compute: bit i of col j lands at i*2+j
    // x=5 (101): bits 0,2 set -> positions 0,4 ; y=3 (011): bits 0,1 ->
    // positions 1,3 -> z = 1 + 16 + 2 + 8 = 27
    val z = Seq((5L, 3L)).toDF("bx", "by")
      .select(Zorder.zvalue(Seq(col("bx"), col("by")), 3).as("z"))
      .as[Long].head()
    assert(z == 27L, s"z=$z")
  }

  test("bucketing clamps, handles nulls and degenerate ranges") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (0.0, 7.0), (100.0, 7.0), (null, 7.0), (50.0, 7.0))
      .toDF("x", "c")
    val got = Zorder.withBuckets(df, Seq("x", "c"), 4)
      .select("x", "__b_x", "__b_c").collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSet
    // x=100 is the max -> scaled lands exactly at 2^bits, clamped to 15;
    // null -> 0; constant column (min==max) -> all 0
    assert(got == Set(
      (Some(0.0), 0L, 0L), (Some(100.0), 15L, 0L),
      (None, 0L, 0L), (Some(50.0), 8L, 0L)), got.mkString(", "))
  }

  test("z-order concentrates a 2-d box into fewer files than x-range layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // deterministic pseudo-uniform 2-d points (hash-derived, no RNG state)
    val pts = spark.range(100000).select(
      (abs(xxhash64(concat(lit("zx"), col("id")))) % 100000L / 100000.0).as("x"),
      (abs(xxhash64(concat(lit("zy"), col("id")))) % 100000L / 100000.0).as("y"),
      col("id"))
    Zorder.write(pts, s"$dir/z", Seq("x", "y"), bits = 6, numFiles = 16)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/linear_x")

    // a y-selective box: the x-range layout spreads y uniformly over all
    // 16 files; the z-order layout confines this y-band to its quadrant
    def filesHit(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") >= 0.40 && col("y") < 0.45)
        .select(input_file_name()).distinct().count()
    val zHit = filesHit(s"$dir/z")
    val linHit = filesHit(s"$dir/linear_x")
    assert(linHit == 16L, s"x-range layout should spread y everywhere: $linHit")
    assert(zHit <= 8L, s"z-order should confine the y-band: $zHit files")
    // and both layouts return identical rows for the box
    def rows(path: String): Long = spark.read.parquet(path)
      .filter(col("y") >= 0.40 && col("y") < 0.45 && col("x") < 0.25).count()
    assert(rows(s"$dir/z") == rows(s"$dir/linear_x"))
  }

  test("REAL events table: z-layout is query-invariant and scan-local") {
    val sf = "/root/testdata/sf0.01"
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_ev").toString
    val events = graft.Tables.events(spark, sf)
    // two physical layouts of the same table: z-ordered on (user_id, ts)
    // vs the natural single-key time clustering
    Zorder.write(events, s"$dir/z", Seq("user_id", "ts"), bits = 8, numFiles = 16)
    events.repartitionByRange(16, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(s"$dir/by_ts")
    val zEvents = spark.read.parquet(s"$dir/z")
    val tsEvents = spark.read.parquet(s"$dir/by_ts")

    // (a) LAYOUT INVARIANCE on a registered query shape: q_unique_users_5m's
    // body (integer-exact output) over all three layouts, strict equality
    def result(df: org.apache.spark.sql.DataFrame): Set[String] =
      graft.queries.Serving.uniqueUsers5m(df).collect()
        .map(_.mkString("|")).toSet
    val want = result(events)
    assert(result(zEvents) == want, "z layout changed query results")
    assert(result(tsEvents) == want, "ts layout changed query results")

    // (b) SCAN LOCALITY: a user-band predicate. The ts layout spreads every
    // user over all 16 files; the z layout confines a user band to a
    // fraction of them. Evidence from the EXECUTED plan's parquet scan
    // (numOutputRows = rows surviving row-group/page skipping) plus the
    // matching rows' file spread.
    val Row2 = events.agg(min("user_id"), max("user_id")).head
    val (mnU, mxU) = (Row2.getLong(0), Row2.getLong(1))
    val loU = mnU + (mxU - mnU) * 2 / 5
    val hiU = mnU + (mxU - mnU) * 9 / 20 // a 5% user band
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def scanStats(df: org.apache.spark.sql.DataFrame, path: String): (Long, Long, Long) =
      try {
        val q = df.filter(col("user_id") >= loU && col("user_id") < hiU)
        val matched = q.count()
        val scans = q.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.get("Location").exists(_.contains(path)) => f
        }
        assert(scans.nonEmpty, s"no parquet scan over $path in plan")
        val files = q.select(input_file_name()).distinct().count()
        (matched, scans.map(_.metrics("numOutputRows").value).sum, files)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val (zMatch, zScanRows, zFiles) = scanStats(zEvents, s"$dir/z")
    val (tMatch, tScanRows, tFiles) = scanStats(tsEvents, s"$dir/by_ts")
    assert(zMatch == tMatch && zMatch > 0, s"band rows differ: $zMatch vs $tMatch")
    // the ts layout cannot skip anything for a user predicate: its scan
    // surfaces (nearly) the whole table; the z scan skips most row groups
    assert(zScanRows * 2 <= tScanRows,
      s"z scan should skip most row groups: z=$zScanRows ts=$tScanRows")
    assert(zFiles * 2 <= tFiles,
      s"z should confine the user band to few files: z=$zFiles ts=$tFiles")
  }
}
