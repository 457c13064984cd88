package graft.queries

import graft.{QueryDef, Tables}
import graft.streaming.{CdpEvent, CdpPipeline}
import org.apache.spark.sql.functions._

/** Oracle coverage for the CDP pipeline's stateful core: the events table
  * is mapped onto CDP events (every event a TRACK; `signup` events also
  * carry a `plan` trait from the k-tag's parity), folded through the SAME
  * per-event transition the streaming operator uses
  * (`CdpPipeline.applyEvent` via `profileSnapshots`), and the final
  * profiles are checked against a declarative SQL restatement of the fold:
  * LWW trait by (ts, event_id), lastSeen = max ts, 24 h minute-bucketed
  * TRACK counter anchored at lastSeen, segment predicates.
  */
object CdpReplay {

  private val kTagSql = """regexp_extract(props, '"k":\s*(\d+)', 1)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_cdp_profile_replay",
      s"""WITH e AS (
         |  SELECT user_id, event_id, ts, event_type,
         |         CASE WHEN event_type = 'signup'
         |              THEN CASE WHEN CAST($kTagSql AS BIGINT) % 2 = 0
         |                        THEN 'pro' ELSE 'free' END END AS plan_trait
         |  FROM events),
         |last_seen AS (
         |  SELECT user_id, max(ts) AS last_ts FROM e GROUP BY user_id),
         |lww AS (
         |  SELECT user_id, plan_trait AS plan FROM (
         |    SELECT user_id, plan_trait,
         |           row_number() OVER (PARTITION BY user_id
         |                              ORDER BY epoch_us(ts) DESC,
         |                                       lpad(CAST(event_id AS VARCHAR), 12, '0') DESC) AS rn
         |    FROM e WHERE plan_trait IS NOT NULL) WHERE rn = 1),
         |cnt AS (
         |  SELECT e.user_id, count(*) AS track_24h
         |  FROM e JOIN last_seen l ON l.user_id = e.user_id
         |  WHERE (epoch_us(e.ts) // 60000000) * 60000000 >=
         |        ((epoch_us(l.last_ts) - 86400000000) // 60000000) * 60000000
         |  GROUP BY e.user_id)
         |SELECT 'user:' || l.user_id AS profile_id,
         |       w.plan,
         |       c.track_24h,
         |       CAST(epoch_us(l.last_ts) // 1000 AS BIGINT) AS last_seen_ms,
         |       c.track_24h >= ${CdpPipeline.PowerUserThreshold} AS power_user,
         |       coalesce(w.plan, '') = 'pro' AS pro_plan
         |FROM last_seen l
         |LEFT JOIN lww w ON w.user_id = l.user_id
         |JOIN cnt c ON c.user_id = l.user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val kTag = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
      val cdpEvents = Tables.events(s, dir)
        .select(
          lpad(col("event_id").cast("string"), 12, "0").as("eventId"), col("ts"),
          col("event_type"),
          col("user_id").cast("string").as("userId"),
          when(col("event_type") === "signup",
            when(kTag.cast("long") % 2 === 0, "pro").otherwise("free")).as("plan"))
        .map { r =>
          CdpEvent(
            eventId = r.getAs[String]("eventId"),
            ts = r.getAs[java.sql.Timestamp]("ts"),
            eventType = "TRACK",
            userId = Some(r.getAs[String]("userId")),
            anonymousId = None, email = None,
            name = Some(r.getAs[String]("event_type")),
            traits =
              Option(r.getAs[String]("plan")).map(p => Map("plan" -> p)).getOrElse(Map.empty))
        }
      CdpPipeline.profileSnapshots(s, cdpEvents)
        .select(
          col("profileId").as("profile_id"),
          element_at(col("traits"), "plan").as("plan"),
          col("trackCount24h").as("track_24h"),
          unix_millis(col("lastSeen")).as("last_seen_ms"),
          array_contains(col("segments"), "power_user").as("power_user"),
          array_contains(col("segments"), "pro_plan").as("pro_plan"))
    })
}
