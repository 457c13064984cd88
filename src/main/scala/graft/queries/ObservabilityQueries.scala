package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Bloom, Cms, Hist, Hll, Num}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-observability operators: windowed heavy hitters (who dominates
  * a time bucket) and column profiling (the data-quality scan run before
  * training ingestion). Both are one-shuffle groupBy programs.
  */
object ObservabilityQueries {

  val defs: Seq[QueryDef] = Seq(

    // Heavy hitters: top-3 users per hour by event count (count desc,
    // user_id asc tie-break). groupBy + rank window — at scale the rank
    // partitions by the hour bucket, so no global sort.
    QueryDef(
      "q_heavy_hitters",
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hour_bucket, user_id,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT hour_bucket, user_id, n,
        |       CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT hour_bucket, user_id, n,
        |         row_number() OVER (
        |           PARTITION BY hour_bucket ORDER BY n DESC, user_id) AS rnk
        |  FROM c)
        |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("hour_bucket"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("hour_bucket")).orderBy(col("n").desc, col("user_id")))
          .cast("int"))
        .filter(col("rnk") <= 3)
    },

    // Column profile over lineitem's numeric measures: row count, nulls,
    // exact distinct, min/max — one grouped pass per column, unioned.
    QueryDef(
      "q_data_profile", {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_rows,
             |       count(*) - count($c) AS n_null,
             |       count(DISTINCT $c) AS n_distinct,
             |       round(CAST(min($c) AS DOUBLE) + 0.00000025, 4) AS min_v,
             |       round(CAST(max($c) AS DOUBLE) + 0.00000025, 4) AS max_v
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n")
      }) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        li.agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          Num.r4(min(col(c)).cast("double")).as("min_v"),
          Num.r4(max(col(c)).cast("double")).as("max_v"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_v"), col("max_v"))
      }.reduce(_ unionAll _)
    },

    // Deterministic HLL register table (`operators/Hll.scala`): per
    // event_type, the 256-register sketch of distinct users. Every value
    // is integer (bucket, max-rho register), so the oracle check is
    // hash-exact; union of register tables merges with max(m) — the
    // mergeable-across-days property that makes the sketch the 100 TB
    // distinct-count shape.
    QueryDef(
      "q_hll_registers",
      Hll.registersSql("CAST(user_id AS VARCHAR)", Seq("event_type"), "events")) {
      (s, dir) =>
        Hll.registers(Tables.events(s, dir), col("user_id"), Seq("event_type"))
    },

    // The folded estimate vs the exact distinct count per event_type —
    // the accuracy proof for the sketch (HLL at m=256 has ~6.5% stddev;
    // rel_err is reported, not asserted). Both engines compute the same
    // integer register sum; the single float division + ln at the end is
    // rounded through the repo's Num.r4 bias on both sides.
    QueryDef(
      "q_hll_distinct",
      s"""WITH regs0 AS (
         |  ${Hll.registersSql("CAST(user_id AS VARCHAR)", Seq("event_type"), "events")
              .replace("\n", "\n  ")}),
         |regs AS (SELECT event_type AS grp, bucket, m FROM regs0),
         |folded AS (
         |  ${Hll.estimateSql.replace("\n", "\n  ")}),
         |exact AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY event_type)
         |SELECT event_type, n_exact,
         |       round(est + 0.00000025, 4) AS est,
         |       round((est - n_exact) / n_exact + 0.00000025, 4) AS rel_err
         |FROM exact JOIN folded ON folded.grp = exact.event_type""".stripMargin) {
      (s, dir) =>
        val events = Tables.events(s, dir)
        val regs = Hll.registers(events, col("user_id"), Seq("event_type"))
        val folded = Hll.estimate(regs, Seq("event_type"))
        val exact = events.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        exact.join(folded, "event_type")
          .select(col("event_type"), col("n_exact"),
            Num.r4(col("est")).as("est"),
            Num.r4((col("est") - col("n_exact")) / col("n_exact")).as("rel_err"))
    },

    // Sketch composition end-to-end — the "never re-scan yesterday"
    // pattern the 100 TB notes promise: per-DAY register tables (what a
    // daily ingest job persists) max-merge into the 30-day register table,
    // which folds to the same distinct estimate a direct pass over all 30
    // days of raw data produces — asserted by the merge_exact column
    // (max of per-day maxes == global max, register for register), while
    // rel_err reports accuracy vs the exact distinct. At scale the daily
    // tables are ~256 rows/group: the month-end distinct costs a merge of
    // 30 tiny tables, never a re-read of 30 days of events.
    QueryDef(
      "q_hll_merge_days",
      s"""WITH d AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_bucket,
         |         CAST(user_id AS VARCHAR) AS v
         |  FROM events),
         |daily AS (
         |  ${Hll.registersSql("v", Seq("event_type", "day_bucket"), "d")
              .replace("\n", "\n  ")}),
         |merged AS (
         |  SELECT event_type, bucket, max(m) AS m
         |  FROM daily GROUP BY event_type, bucket),
         |mregs AS (SELECT event_type AS grp, bucket, m FROM merged),
         |mfold AS (
         |  ${Hll.estimateSqlOver("mregs").replace("\n", "\n  ")}),
         |direct0 AS (
         |  ${Hll.registersSql("CAST(user_id AS VARCHAR)", Seq("event_type"), "events")
              .replace("\n", "\n  ")}),
         |dregs AS (SELECT event_type AS grp, bucket, m FROM direct0),
         |dfold AS (
         |  ${Hll.estimateSqlOver("dregs").replace("\n", "\n  ")}),
         |days AS (
         |  SELECT event_type, count(DISTINCT day_bucket) AS n_days
         |  FROM d GROUP BY event_type),
         |exact AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY event_type)
         |SELECT days.event_type, days.n_days, exact.n_exact,
         |       round(mf.est + 0.00000025, 4) AS est_merged,
         |       round((mf.est - n_exact) / n_exact + 0.00000025, 4) AS rel_err,
         |       round(mf.est + 0.00000025, 4) = round(df.est + 0.00000025, 4)
         |         AS merge_exact
         |FROM days
         |JOIN exact USING (event_type)
         |JOIN mfold mf ON mf.grp = days.event_type
         |JOIN dfold df ON df.grp = days.event_type""".stripMargin) { (s, dir) =>
      val events = Tables.events(s, dir)
      val withDay = events.select(col("event_type"),
        // floor division to match DuckDB's `//` (Spark's `div` truncates
        // toward zero, diverging for pre-1970 timestamps); the double
        // quotient is exact here — epoch-µs < 2^53 and 1/86400000000 is
        // wider than a double ulp at day-number magnitude
        expr("CAST(floor(unix_micros(ts) / 86400000000.0) AS BIGINT)")
          .as("day_bucket"), col("user_id"))
      val daily = Hll.registers(withDay, col("user_id"),
        Seq("event_type", "day_bucket"))
      val merged = daily.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("m")).as("m"))
      val mfold = Hll.estimate(merged, Seq("event_type"))
      val dfold = Hll.estimate(
          Hll.registers(events, col("user_id"), Seq("event_type")),
          Seq("event_type"))
        .withColumnRenamed("est", "est_direct")
      val days = withDay.groupBy(col("event_type"))
        .agg(countDistinct(col("day_bucket")).as("n_days"))
      val exact = events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      days.join(exact, "event_type").join(mfold, "event_type")
        .join(dfold, "event_type")
        .select(col("event_type"), col("n_days"), col("n_exact"),
          Num.r4(col("est")).as("est_merged"),
          Num.r4((col("est") - col("n_exact")) / col("n_exact")).as("rel_err"),
          (Num.r4(col("est")) === Num.r4(col("est_direct"))).as("merge_exact"))
    },

    // Deterministic count-min sketch register table
    // (`operators/Cms.scala`): per-user event counts folded into a 4x512
    // integer counter grid. Pure counts -> hash-exact oracle; sketches
    // merge by summing cnt on (r, c) — the linear-sketch property that
    // lets daily frequency tables compose by addition at 100 TB.
    QueryDef(
      "q_cms_registers",
      Cms.registersSql("CAST(user_id AS VARCHAR)", "events")) { (s, dir) =>
      Cms.registers(Tables.events(s, dir), col("user_id"))
    },

    // Point estimates vs exact counts for a deterministic probe subset
    // (user_id % 7 = 0): est = min over the 4 addressed counters, always
    // >= the true count (collisions only add). All-integer output, so the
    // accuracy evidence itself is hash-exact. The ~16 KB register table is
    // broadcast to the probes — no shuffle beyond the probes' own groupBy.
    QueryDef(
      "q_cms_estimate",
      s"""WITH regs AS (
         |  ${Cms.registersSql("CAST(user_id AS VARCHAR)", "events")
              .replace("\n", "\n  ")}),
         |probes AS (
         |  SELECT CAST(user_id AS VARCHAR) AS v, user_id, count(*) AS n_exact
         |  FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2),
         |pr AS (
         |  SELECT user_id, n_exact, r, ${Cms.bucketSql("v", "r")} AS c
         |  FROM probes CROSS JOIN ${Cms.saltsSql})
         |SELECT user_id, n_exact,
         |       min(coalesce(cnt, 0)) AS est,
         |       min(coalesce(cnt, 0)) - n_exact AS overcount
         |FROM pr LEFT JOIN regs ON regs.r = pr.r AND regs.c = pr.c
         |GROUP BY user_id, n_exact""".stripMargin) { (s, dir) =>
      val events = Tables.events(s, dir)
      val regs = Cms.registers(events, col("user_id"))
      val probes = events.filter(col("user_id") % 7 === 0)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .select(col("user_id").cast("string").as("v"),
          col("user_id"), col("n_exact"))
      Cms.estimate(regs, probes)
        .select(col("user_id"), col("n_exact"), col("est"),
          (col("est") - col("n_exact")).as("overcount"))
    },

    // Deterministic Bloom filter (`operators/Bloom.scala`) over the set
    // of customers who placed an order, dumped as per-1024-bit-block set
    // counts — 64 hash-exact rows summarizing the whole bit array. The
    // filter is bounded by 2^16 positions no matter how many orders fed
    // it; filters union-merge by position-set union.
    QueryDef(
      "q_bloom_bits",
      s"""WITH bits AS (
         |  ${Bloom.bitsSql("CAST(o_custkey AS VARCHAR)", "orders")
              .replace("\n", "\n  ")})
         |SELECT pos // 1024 AS block, count(*) AS n_bits
         |FROM bits GROUP BY 1""".stripMargin) { (s, dir) =>
      Bloom.bits(Tables.orders(s, dir), col("o_custkey"))
        .groupBy(expr("pos div 1024").as("block"))
        .agg(count(lit(1)).as("n_bits"))
    },

    // Membership evidence: probe every customer PLUS a shifted key range
    // that is guaranteed absent (the testdata gives every customer an
    // order, so real keys alone would have no true negatives to measure
    // the FP rate on). No false negatives by construction (every actual
    // member reads maybe); the all-integer counters make the FP evidence
    // itself hash-exact. This is the correctness-preserving pre-join
    // shape for 100 TB contamination checks: broadcast the bounded
    // position set, drop definite-negative probes map-side BEFORE their
    // shuffle, let the exact join resolve the few-% false positives.
    QueryDef(
      "q_bloom_membership",
      s"""WITH bits AS (
         |  ${Bloom.bitsSql("CAST(o_custkey AS VARCHAR)", "orders")
              .replace("\n", "\n  ")}),
         |probes AS (
         |  SELECT CAST(c_custkey AS VARCHAR) AS v, c_custkey FROM customer
         |  UNION ALL
         |  SELECT CAST(c_custkey + 10000000 AS VARCHAR), c_custkey + 10000000
         |  FROM customer),
         |pp AS (
         |  SELECT c_custkey, ${Bloom.posSql("v", "j")} AS pos
         |  FROM probes CROSS JOIN ${Bloom.saltsSql}),
         |m AS (
         |  SELECT c_custkey, count(hit) = count(*) AS maybe
         |  FROM pp LEFT JOIN (SELECT pos, 1 AS hit FROM bits) b USING (pos)
         |  GROUP BY c_custkey),
         |actual AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
         |SELECT count(*) AS n_probes,
         |       CAST(sum(CASE WHEN a.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_actual,
         |       CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
         |       CAST(sum(CASE WHEN maybe AND a.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
         |FROM m LEFT JOIN actual a ON a.c_custkey = m.c_custkey""".stripMargin) {
      (s, dir) =>
        val orders = Tables.orders(s, dir)
        val bits = Bloom.bits(orders, col("o_custkey"))
        val cust = Tables.customer(s, dir)
        val probes = cust
          .select(col("c_custkey").cast("string").as("v"), col("c_custkey"))
          .unionAll(cust.select(
            (col("c_custkey") + 10000000L).cast("string").as("v"),
            (col("c_custkey") + 10000000L).as("c_custkey")))
        val actual = orders.select(col("o_custkey").as("c_custkey"))
          .distinct().withColumn("act", lit(1))
        Bloom.mightContain(bits, probes)
          .join(actual, Seq("c_custkey"), "left")
          .agg(
            count(lit(1)).as("n_probes"),
            sum(when(col("act").isNotNull, 1).otherwise(0)).cast("long").as("n_actual"),
            sum(when(col("maybe"), 1).otherwise(0)).cast("long").as("n_maybe"),
            sum(when(col("maybe") && col("act").isNull, 1).otherwise(0))
              .cast("long").as("n_false_pos"))
    },

    // Deterministic histogram quantile sketch (`operators/Hist.scala`):
    // per-event-type bucket counts over `value` in 2^9-cent buckets —
    // the register table quantiles fold from. Pure integers -> hash-exact
    // oracle; histograms SUM-merge on (group, b), the mergeability exact
    // percentiles lack (q_percentile_by_type's exact P95 needs the full
    // value multiset; this needs a bounded table per group).
    QueryDef(
      "q_hist_buckets",
      Hist.bucketsSql("value", Seq("event_type"), "events")) { (s, dir) =>
      Hist.buckets(Tables.events(s, dir), col("value"), Seq("event_type"))
    },

    // p50/p90/p99 lower-bound estimates per event_type from the bucket
    // table: first bucket whose running count reaches the integer rank
    // target (cum * 100 >= p * total — no ceil, no float). Error bounded
    // by one bucket width; the window partitions by event_type, so no
    // global sort anywhere.
    QueryDef(
      "q_hist_quantiles",
      s"""WITH hb AS (
         |  ${Hist.bucketsSql("value", Seq("event_type"), "events")
              .replace("\n", "\n  ")}),
         |h AS (SELECT event_type AS grp, b, n FROM hb),
         |q AS (
         |  ${Hist.quantilesSql(Seq(50, 90, 99)).replace("\n", "\n  ")})
         |SELECT grp AS event_type, p50_cents, p90_cents, p99_cents
         |FROM q""".stripMargin) { (s, dir) =>
      val h = Hist.buckets(Tables.events(s, dir), col("value"), Seq("event_type"))
      Hist.quantiles(h, Seq("event_type"), Seq(50, 90, 99))
    })
}
