package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Serving projections (SURVEY §2.2 P5, §2.3 A11/A12): top-20 profile
  * summary and per-window unique counts/rates.
  */
object Serving {

  val defs: Seq[QueryDef] = Seq(

    // P5: top-20 profiles by lastSeen (deterministic tie-break on user),
    // identifier prefix stripped for display.
    QueryDef(
      "q_top20_profiles",
      """SELECT user_id,
        |       CAST(epoch_us(last_seen) AS BIGINT) AS last_seen_us,
        |       n_events,
        |       regexp_replace('user:' || user_id, '^(user:|email:|anon:)', '') AS display_id
        |FROM (
        |  SELECT user_id, max(ts) AS last_seen, count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |ORDER BY epoch_us(last_seen) DESC, user_id LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_seen"), count(lit(1)).as("n_events"))
        .orderBy(col("last_seen").desc, col("user_id"))
        .limit(20)
        .select(col("user_id"),
          unix_micros(col("last_seen")).as("last_seen_us"),
          col("n_events"),
          regexp_replace(concat(lit("user:"), col("user_id")),
            "^(user:|email:|anon:)", "").as("display_id"))
    },

    // A11/A12: unique users + rate per 5-minute tumbling window per type.
    QueryDef(
      "q_unique_users_5m",
      """SELECT event_type,
        |       CAST(epoch(time_bucket(INTERVAL 5 MINUTE, ts)) AS BIGINT) AS bucket_s,
        |       count(DISTINCT user_id) AS uniq_users,
        |       count(*) AS cnt,
        |       round(count(*) / 5.0 + 0.00000025, 4) AS rate_per_min
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      uniqueUsers5m(Tables.events(s, dir))
    })

  /** q_unique_users_5m's body over an arbitrary events relation — shared
    * with ZorderSpec, which runs the same registered shape over
    * alternative storage layouts (integer-exact output, so layout
    * invariance is a strict equality check).
    */
  def uniqueUsers5m(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    events
      .groupBy(col("event_type"),
        unix_timestamp(window(col("ts"), "5 minutes").getField("start")).as("bucket_s"))
      .agg(
        countDistinct(col("user_id")).as("uniq_users"),
        count(lit(1)).as("cnt"))
      .withColumn("rate_per_min", graft.operators.Num.r4(col("cnt") / 5.0))
}
