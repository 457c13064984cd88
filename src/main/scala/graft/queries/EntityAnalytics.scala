package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Ewma, Num, Rules, SlidingWindows}
import org.apache.spark.sql.functions._

/** Entity-analytics surface (SURVEY §2.3/§2.2: A1–A8, P3/P6, F2/F3, R1–R4)
  * over the `events` table (entity = user_id, type = event_type).
  *
  * Rule thresholds: the reference defaults (rate >= 20/min, 4x EWMA, ...)
  * target dense production streams; the driver testdata is sparse (per-key
  * inter-arrival ≫ the windows), so the registered query entries use scaled
  * thresholds that exercise the same code path with non-empty output. The
  * operator API defaults remain the reference values.
  */
object EntityAnalytics {

  /** Tag extraction from the props JSON column — regexp on both sides (the
    * DuckDB json extension may not be loadable offline).
    */
  private val sparkTag = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
  private val duckTag = """regexp_extract(props, '"k":\s*(\d+)', 1)"""

  /** Shared DuckDB window-clause base: epoch-µs ordering per entity key. */
  private def duckWindows(frames: (String, Long)*): String =
    frames.map { case (n, sec) =>
      s"$n AS (PARTITION BY user_id, event_type ORDER BY epoch_us(ts) " +
        s"RANGE BETWEEN ${sec * 1000000L} PRECEDING AND CURRENT ROW)"
    }.mkString("WINDOW ", ", ", "")

  /** Sequential EWMA in DuckDB via recursive CTE — bit-identical to the
    * Spark fold: both evaluate `0.1*x + 0.9*e_prev` in IEEE doubles (the
    * Scala side's `1 - alpha` rounds to exactly double(0.9)), so rounding
    * can never diverge. A closed-form `sum(alpha*(1-a)^(k-j)*x_j)` oracle
    * differs in the last ulps and flips at decimal rounding boundaries.
    */
  private val ewmaCte =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, event_type, event_id, value,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |ewma AS (
      |  SELECT user_id, event_type, event_id, value AS ewma, rn
      |  FROM seq WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.event_type, s.event_id,
      |         0.1 * s.value + 0.9 * e.ewma, s.rn
      |  FROM seq s JOIN ewma e
      |    ON s.user_id = e.user_id AND s.event_type = e.event_type
      |   AND s.rn = e.rn + 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // A1–A4: per-event trailing-window aggregates, one shuffle on
    // (user_id, event_type), incremental range frames.
    QueryDef(
      "q_sliding_window_aggs",
      s"""SELECT event_id, user_id, event_type,
         |       CAST(count(*) OVER w60 AS DOUBLE)            AS rate_60s,
         |       count(*) OVER w60                            AS cnt_60s,
         |       round(sum(value) OVER w30 + 0.00000025, 4)                AS sum_30s,
         |       round(sum(value) OVER w300 + 0.00000025, 4)               AS sum_5m,
         |       count(*) OVER w300                           AS cnt_5m,
         |       round((sum(value) OVER w300) / (count(*) OVER w300) + 0.00000025, 4) AS avg_5m
         |FROM events
         |${duckWindows("w60" -> 60, "w30" -> 30, "w300" -> 300)}""".stripMargin) { (s, dir) =>
      SlidingWindows.withSlidingAggs(
        Tables.events(s, dir),
        Seq(col("user_id"), col("event_type")), col("ts"), col("value"))
        .select("event_id", "user_id", "event_type",
          "rate_60s", "cnt_60s", "sum_30s", "sum_5m", "cnt_5m", "avg_5m")
    },

    // A5: per-event EWMA, sequential per-key fold (flatMapSortedGroups);
    // oracle is the exact recursive CTE (`ewmaCte` — same IEEE recurrence,
    // bit-identical at any SF; see its doc for why the closed form was
    // rejected).
    QueryDef(
      "q_ewma",
      s"""$ewmaCte
         |SELECT user_id, event_type, event_id, round(ewma + 0.00000025, 4) AS ewma
         |FROM ewma""".stripMargin) { (s, dir) =>
      Ewma.perEvent(s, Tables.events(s, dir), 0.1)
        .toDF().withColumn("ewma", Num.r4(col("ewma")))
    },

    // F2/A9 bucketing: tumbling 1-minute counts per key.
    QueryDef(
      "q_rate_per_min_buckets",
      """SELECT user_id, event_type,
        |       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_s,
        |       count(*) AS cnt
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"),
          unix_timestamp(date_trunc("minute", col("ts"))).as("bucket_s"))
        .agg(count(lit(1)).as("cnt"))
    },

    // A8: exact p50/p95 per event type + the reference's heuristic fallback
    // max(floor(10*avg), 1000) (`core/Rules.kt:190-200`).
    QueryDef(
      "q_percentile_by_type",
      """SELECT event_type,
        |       round(quantile_cont(value, 0.50) + 0.00000025, 4) AS p50,
        |       round(quantile_cont(value, 0.95) + 0.00000025, 4) AS p95,
        |       round(greatest(floor(avg(value) * 10 + 0.00000025), 1000.0) + 0.00000025, 4) AS p95_fallback,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          Num.r4(percentile(col("value"), lit(0.50))).as("p50"),
          Num.r4(percentile(col("value"), lit(0.95))).as("p95"),
          Num.r4(greatest(Num.floorB(avg(col("value")) * 10).cast("double"), lit(1000.0)))
            .as("p95_fallback"),
          count(lit(1)).as("n"))
    },

    // R1 velocity spike, scaled thresholds (factor 0.01, minRate 1).
    QueryDef(
      "q_r1_velocity_spike",
      s"""WITH a AS (
         |  SELECT event_id, user_id, event_type,
         |         CAST(count(*) OVER w60 AS DOUBLE) AS rate_now,
         |         CASE WHEN count(*) OVER w300 = 0 THEN 0.0
         |              ELSE (sum(value) OVER w300) / (count(*) OVER w300) END AS avg_5m
         |  FROM events
         |  ${duckWindows("w60" -> 60, "w300" -> 300)})
         |SELECT event_id, user_id, event_type,
         |       'R1_VELOCITY_SPIKE' AS rule,
         |       CASE WHEN avg_5m * 0.01 <= 0 THEN 'HIGH'
         |            WHEN rate_now / (avg_5m * 0.01) >= 10 THEN 'HIGH'
         |            WHEN rate_now / (avg_5m * 0.01) >= 5 THEN 'MEDIUM'
         |            ELSE 'LOW' END AS severity,
         |       round(rate_now + 0.00000025, 4) AS rate_now,
         |       round(avg_5m + 0.00000025, 4) AS avg_5m,
         |       round(avg_5m * 0.01 + 0.00000025, 4) AS threshold
         |FROM a
         |WHERE rate_now > avg_5m * 0.01 AND rate_now >= 1.0""".stripMargin) { (s, dir) =>
      Rules.velocitySpike(Tables.events(s, dir), factor = 0.01, minRate = 1.0)
    },

    // R2 value spike, scaled thresholds (factor 1.2, minCount 1).
    QueryDef(
      "q_r2_value_spike",
      s"""$ewmaCte,
         |c AS (
         |  SELECT event_id, user_id, event_type, value,
         |         count(*) OVER w60 AS count_60s
         |  FROM events
         |  ${duckWindows("w60" -> 60)})
         |SELECT c.event_id, c.user_id, c.event_type,
         |       'R2_VALUE_SPIKE' AS rule,
         |       CASE WHEN e.ewma * 1.2 <= 0 THEN 'HIGH'
         |            WHEN c.value / (e.ewma * 1.2) >= 10 THEN 'HIGH'
         |            WHEN c.value / (e.ewma * 1.2) >= 5 THEN 'MEDIUM'
         |            ELSE 'LOW' END AS severity,
         |       round(c.value + 0.00000025, 4) AS value_now,
         |       round(e.ewma + 0.00000025, 4) AS ewma,
         |       round(e.ewma * 1.2 + 0.00000025, 4) AS threshold,
         |       c.count_60s
         |FROM c JOIN ewma e ON c.event_id = e.event_id
         |WHERE c.value > e.ewma * 1.2 AND c.count_60s >= 1""".stripMargin) { (s, dir) =>
      Rules.valueSpike(s, Tables.events(s, dir), alpha = 0.1, factor = 1.2, minCount = 1)
    },

    // R3 (real spec, stubbed in the reference): conflicting tag values for
    // the same entity within the trailing day.
    QueryDef(
      "q_r3_tag_mismatch",
      s"""WITH t AS (SELECT *, $duckTag AS tag_value FROM events),
         |a AS (
         |  SELECT event_id, user_id, event_type, tag_value,
         |         count(DISTINCT tag_value) OVER
         |           (PARTITION BY user_id ORDER BY epoch_us(ts)
         |            RANGE BETWEEN ${86400L * 1000000L} PRECEDING AND CURRENT ROW)
         |           AS n_values
         |  FROM t)
         |SELECT event_id, user_id, event_type,
         |       'R3_TAG_MISMATCH' AS rule, 'MEDIUM' AS severity,
         |       tag_value, n_values
         |FROM a WHERE n_values > 1""".stripMargin) { (s, dir) =>
      Rules.tagMismatch(Tables.events(s, dir), sparkTag, windowSec = 86400)
    },

    // R4 exfil, scaled thresholds (factor 0.5, min 50).
    QueryDef(
      "q_r4_exfil",
      s"""WITH a AS (
         |  SELECT event_id, user_id, event_type, value,
         |         sum(value) OVER w30 AS sum_30s,
         |         CASE WHEN count(*) OVER w3600 = 0 THEN 0.0
         |              ELSE (sum(value) OVER w3600) / (count(*) OVER w3600) END AS avg_1h
         |  FROM events
         |  ${duckWindows("w30" -> 30, "w3600" -> 3600)})
         |SELECT event_id, user_id, event_type,
         |       'R4_EXFIL' AS rule, 'HIGH' AS severity,
         |       round(sum_30s + 0.00000025, 4) AS sum_30s,
         |       round(greatest(floor(avg_1h * 0.5 + 0.00000025), 50.0) + 0.00000025, 4) AS p95_threshold,
         |       round(value + 0.00000025, 4) AS current_value
         |FROM a
         |WHERE sum_30s > greatest(floor(avg_1h * 0.5 + 0.00000025), 50.0)""".stripMargin) { (s, dir) =>
      Rules.exfil(Tables.events(s, dir), factorP95 = 0.5, minThreshold = 50.0)
    })
}
