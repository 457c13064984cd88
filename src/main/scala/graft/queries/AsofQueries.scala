package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** As-of join surface: every event matched to the user's most recent
  * signup at or before it. The oracle is DuckDB's native ASOF JOIN, the
  * Spark side is the union-and-propagate operator (`AsofJoin.backward`) —
  * two completely independent formulations that must agree row-for-row.
  */
object AsofQueries {

  val defs: Seq[QueryDef] = Seq(
    // The right side dedupes to ONE row per (user_id, ts) — max event_id —
    // BEFORE either join: AsofJoin.backward breaks equal-ts ties
    // deterministically (largest payload struct) but DuckDB's native ASOF
    // JOIN leaves the pick among equal-ts right rows unspecified, so
    // without the dedupe two simultaneous signups could flake the
    // row-for-row compare on signup_event_id.
    QueryDef(
      "q_asof_last_signup",
      """WITH su AS (
        |  SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
        |SELECT l.event_id,
        |       r.event_id AS signup_event_id,
        |       (epoch_us(l.ts) - epoch_us(r.ts)) // 1000000 AS lag_s
        |FROM events l
        |ASOF LEFT JOIN su r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("sid"))
      AsofJoin.backward(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        signups,
        keyCols = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        rightPayload = Map("sid" -> "signup_event_id"))
        .select(col("event_id"), col("signup_event_id"),
          expr("(unix_micros(ts) - unix_micros(asof_ts)) div 1000000").as("lag_s"))
    })
}
