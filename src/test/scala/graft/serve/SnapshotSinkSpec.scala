package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSinkSpec extends SparkSpec {

  test("changed-only hub suppresses identical snapshots") {
    val hub = new SnapshotSink.ChangedOnlyHub[(String, Long)]
    var received = List.empty[Seq[(String, Long)]]
    hub.subscribe(s => received = s :: received)
    assert(hub.push(Seq(("a", 1L))))       // first: emits
    assert(!hub.push(Seq(("a", 1L))))      // unchanged: suppressed
    assert(hub.push(Seq(("a", 2L))))       // changed: emits
    assert(hub.emitCount == 2)
    assert(received.size == 2)
  }

  test("topN profiles: lastSeen desc, prefixes stripped") {
    import spark.implicits._
    val profiles = Seq(
      ("p1", ts("2024-01-01T00:00:03Z"), Seq("user:u1", "email:a@b.c")),
      ("p2", ts("2024-01-01T00:00:01Z"), Seq("anon:x")),
      ("p3", ts("2024-01-01T00:00:02Z"), Seq("user:u3")))
      .toDF("profileId", "lastSeen", "identifiers")
    val out = SnapshotSink.topNProfiles(profiles, 2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("p1", "p3"))
    assert(out.head.getSeq[String](2) == Seq("u1", "a@b.c"))
  }

  test("observe() metric is reported on the query progress") {
    import spark.implicits._
    val df = SnapshotSink.observed(Seq(1, 2, 3).toDF("x"), "stats")
    df.collect()
    // batch observe: metric retrievable via the collected listener path in
    // streaming; here we assert the plan carries the observation
    assert(df.queryExecution.analyzed.toString.contains("CollectMetrics"))
  }
}
