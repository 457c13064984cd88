package graft.sources

import graft.SparkSpec
import graft.functions.Identifiers
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("wire parse: nested envelope, ISO ts, payload flattened") {
    import spark.implicits._
    val raw = Seq(
      """{"eventId":"e1","ts":"2024-01-01T00:00:05Z","payload":{"type":"TRACK","userId":"u1","name":"feature_used","properties":{"k":"1"}}}""")
      .toDF("value")
    val parsed = Sources.parseWire(raw, Sources.cdpEventWireSchema).collect().head
    assert(parsed.getAs[String]("eventId") == "e1")
    assert(parsed.getAs[java.sql.Timestamp]("ts") == ts("2024-01-01T00:00:05Z"))
    assert(parsed.getAs[String]("userId") == "u1")
    assert(parsed.getAs[Map[String, String]]("properties") == Map("k" -> "1"))
  }

  test("CDP validation: blank id / no identifier / TRACK without name rejected") {
    import spark.implicits._
    val rows = Seq(
      ("e1", "TRACK", "u1", "feature"),    // valid
      ("", "TRACK", "u1", "feature"),      // blank event id
      ("e3", "IDENTIFY", null, null),      // no identifier
      ("e4", "TRACK", "u1", null))         // track without name
      .toDF("eventId", "type", "userId", "name")
      .withColumn("anonymousId", lit(null: String))
      .withColumn("email", lit(null: String))
    val (valid, invalid) = Sources.validateCdp(rows)
    assert(valid.collect().map(_.getAs[String]("eventId")).toSet == Set("e1"))
    val reasons = invalid.collect()
      .map(r => r.getAs[String]("eventId") -> r.getAs[String]("invalid_reason")).toMap
    assert(reasons("") == "blank_event_id")
    assert(reasons("e3") == "no_identifier")
    assert(reasons("e4") == "track_without_name")
  }

  test("identifier normalize: prefix inference and email lowercasing") {
    import spark.implicits._
    val out = Seq("  Bob@Example.COM ", "user:u1", "anon-123", "plainid", "email:X@Y.Z")
      .toDF("id").select(Identifiers.normalize(col("id")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("email:bob@example.com", "user:u1", "anon:anon-123",
      "user:plainid", "email:x@y.z"))
  }

  test("identifier extract: compact normalized array") {
    import spark.implicits._
    val out = Seq(("u1", null: String, "a1"), (null: String, "B@C.D", null: String))
      .toDF("userId", "email", "anonymousId")
      .select(Identifiers.extract(col("userId"), col("email"), col("anonymousId")).as("ids"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(out == Seq(Seq("user:u1", "anon:a1"), Seq("email:b@c.d")))
  }

  test("simulator: deterministic, correct SASE mix, ~5% duplicate ids") {
    val a = Simulator.entityEvents(spark, 20000)
    val b = Simulator.entityEvents(spark, 20000)
    // bit-for-bit reproducible (map column json-encoded: set ops reject MAP)
    def comparable(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("tags", to_json(col("tags")))
    assert(comparable(a).exceptAll(comparable(b)).isEmpty)
    val mix = a.groupBy("eventType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 20000.0
    assert(math.abs(mix("CONN_OPEN") / n - 0.5) < 0.02)
    assert(math.abs(mix("CONN_BYTES") / n - 0.3) < 0.02)
    assert(math.abs(mix("LOGIN") / n - 0.2) < 0.02)
    val dupRate = 1.0 - a.select("eventId").distinct().count() / n
    assert(dupRate > 0.03 && dupRate < 0.07)
  }

  test("file stream source parses the wire envelope end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("wire").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "a.json"),
      """{"eventId":"e1","ts":"2024-01-01T00:00:05Z","payload":{"entityId":"ent1","profile":"SASE","type":"LOGIN","value":7,"tags":{"status":"OK"}}}""")
    val stream = Sources.entityStream(spark, "file", dir)
    val query = stream.writeStream.format("memory").queryName("wire_file")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val row = spark.table("wire_file").collect().head
      assert(row.getAs[String]("eventId") == "e1")
      assert(row.getAs[String]("entityId") == "ent1")
      assert(row.getAs[Long]("value") == 7L)
    } finally query.stop()
  }

  test("multimodal frame fan-out: one row per sampled frame") {
    import spark.implicits._
    val assets = Seq((1L, "video payload", "video")).toDF("asset_id", "text", "media_type")
      .select(col("asset_id"), encode(col("text"), "UTF-8").as("payload"), col("media_type"))
    val feats = graft.operators.Multimodal.decodeFeatures(spark, assets)
    val frames = graft.operators.Multimodal.explodeFrames(feats).collect()
    val n = feats.collect().head.getAs[Seq[Int]]("sampled_frames").length
    assert(frames.length == n && n >= 1)
    assert(frames.map(_.getAs[Int]("sample_idx")).toSeq == (0 until n))
  }

  test("watermarked dedup drops repeats within the grace window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = graft.streaming.Watermarks.dedup(
      input.toDF().toDF("eventId", "ts"), "ts", graceSec = 600, "eventId")
    val query = deduped.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      input.addData(("e1", ts("2024-01-01T00:00:00Z")))
      query.processAllAvailable()
      input.addData(("e1", ts("2024-01-01T00:01:00Z"))) // dup, within grace
      input.addData(("e2", ts("2024-01-01T00:01:00Z")))
      query.processAllAvailable()
      val out = spark.table("wm_dedup").collect().map(_.getString(0)).sorted
      assert(out.toSeq == Seq("e1", "e2"))
    } finally query.stop()
  }

  test("late classification tags rows older than the soft lag, drops nothing") {
    import spark.implicits._
    val df = Seq(
      ("a", ts("2024-01-01T00:00:00Z")),
      ("b", ts("2024-01-01T00:09:56Z")))
      .toDF("id", "ts")
    val out = graft.streaming.Watermarks.classifyLate(
      df, "ts", softLagSec = 5, now = to_timestamp(lit("2024-01-01 00:10:00")))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out == Map("a" -> true, "b" -> false))
  }
}
