package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column surface: documents' text bytes stand in for media
  * payloads (`binary` column + media_type metadata); the mapPartitions
  * decode pipeline extracts (stub) features. The oracle replays the stub's
  * md5-derived arithmetic from the source text — texts are ASCII, so
  * md5(text) == md5(utf8-payload-bytes).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_multimodal_decode",
      """WITH a AS (
        |  SELECT doc_id AS asset_id, text,
        |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS media_type
        |  FROM documents),
        |h AS (
        |  SELECT asset_id, CAST(strlen(text) AS INT) AS n_bytes, media_type,
        |         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM a),
        |f AS (
        |  SELECT asset_id, n_bytes, media_type,
        |         CAST(64 + h % 1856 AS INT) AS width,
        |         CAST(64 + (h // 1856) % 1016 AS INT) AS height,
        |         CAST(CASE WHEN media_type = 'video' THEN 1 + h % 120
        |              ELSE 1 END AS INT) AS n_frames
        |  FROM h)
        |SELECT asset_id, n_bytes, media_type, width, height, n_frames,
        |       range(0, n_frames, greatest(n_frames // 4, 1))[1:8] AS sampled_frames
        |FROM f""".stripMargin) { (s, dir) =>
      val assets = Tables.documents(s, dir).select(
        col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"))
      Multimodal.decodeFeatures(s, assets)
        .withColumn("sampled_frames", col("sampled_frames").cast("array<long>"))
    })
}
