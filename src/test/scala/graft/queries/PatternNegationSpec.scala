package graft.queries

import graft.SparkSpec

import scala.util.Random

/** q_pattern_negation beyond the oracle rows: a randomized differential
  * check against a brute-force in-memory matcher on planted event
  * sequences — latest-view selection, the 24 h window cutoff, and the
  * negation semantics (errors strictly between, endpoints excluded) are
  * each load-bearing and each can silently drift in a window-frame
  * refactor.
  */
class PatternNegationSpec extends SparkSpec {

  private val WinUs = 86400000000L

  private def before(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
    aTs < bTs || (aTs == bTs && aId < bId)

  /** Brute force over one user's (eid, tsUs, type) events. */
  private def bruteForce(events: Seq[(Long, Long, String)])
      : Seq[(Long, Long, Long, Boolean)] = {
    val ordered = events.sortBy(e => (e._2, e._1))
    for {
      (peid, pts, ptyp) <- ordered if ptyp == "purchase"
      views = ordered.filter(e => e._3 == "view" && before(e._2, e._1, pts, peid))
      if views.nonEmpty
      (veid, vts, _) = views.maxBy(e => (e._2, e._1))
      if pts - vts <= WinUs
    } yield {
      val dirty = ordered.exists(e => e._3 == "error" &&
        before(vts, veid, e._2, e._1) && before(e._2, e._1, pts, peid))
      (veid, peid, (pts - vts) / 1000000L, !dirty)
    }
  }

  test("pattern match == brute force on 10 random event sequences") {
    import spark.implicits._
    val types = Vector("view", "error", "purchase", "click", "signup")
    for (seed <- 0 until 10) {
      val rnd = new Random(seed)
      // whole-second steps, ~30% jumping past the 24 h window to exercise
      // the cutoff; whole seconds keep java.sql.Timestamp exact
      val events = (0 until 40).map { i =>
        val stepUs = if (rnd.nextInt(10) < 3)
          WinUs + (1L + rnd.nextInt(1000)) * 1000000L
        else rnd.nextInt(3600).toLong * 1000000L
        (i.toLong, stepUs, types(rnd.nextInt(types.size)))
      }.scanLeft((0L, 0L, "click")) { case ((_, acc, _), (id, step, t)) =>
        (id, acc + step, t)
      }.tail
      val want = bruteForce(events).toSet
      val dir = java.nio.file.Files.createTempDirectory(s"pneg_$seed").toString
      events.map { case (eid, tsUs, typ) =>
        (eid, new java.sql.Timestamp(tsUs / 1000), 7L, typ, 0.0, "")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val q = EventAnalytics.defs.find(_.name == "q_pattern_negation").get
      val got = q.query(spark, dir).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
      assert(got == want, s"seed=$seed got=$got want=$want")
    }
  }
}
