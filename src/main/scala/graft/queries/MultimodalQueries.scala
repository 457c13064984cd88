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

  /** Shared oracle CTE chain a → h → f: the stub decode replayed from the
    * source text (texts are ASCII, so md5(text) == md5(payload bytes)).
    */
  private val decodeSql =
    """a AS (
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
      |  FROM h)""".stripMargin

  private def assets(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_multimodal_decode",
      s"""WITH $decodeSql
         |SELECT asset_id, n_bytes, media_type, width, height, n_frames,
         |       array_to_string(range(0, n_frames, greatest(n_frames // 4, 1))[1:8],
         |                       ',') AS sampled_frames
         |FROM f""".stripMargin) { (s, dir) =>
      // serialized to a comma-joined string: the driver's checker sorts
      // result columns and cannot hash an array cell (q_multimodal_frames
      // still checks the exploded per-frame values)
      Multimodal.decodeFeatures(s, assets(s, dir))
        .withColumn("sampled_frames",
          array_join(col("sampled_frames").cast("array<long>"), ","))
    },

    // Frame fan-out: one row per sampled frame (the map side of a
    // per-frame featurization pipeline). Parallel unnest in DuckDB zips
    // position and value like posexplode.
    QueryDef(
      "q_multimodal_frames",
      s"""WITH $decodeSql,
         |sf AS (
         |  SELECT asset_id, media_type,
         |         range(0, n_frames, greatest(n_frames // 4, 1))[1:8] AS frames
         |  FROM f)
         |SELECT asset_id, media_type,
         |       CAST(unnest(range(1, len(frames) + 1)) - 1 AS INT) AS sample_idx,
         |       CAST(unnest(frames) AS BIGINT) AS frame_idx
         |FROM sf""".stripMargin) { (s, dir) =>
      Multimodal.explodeFrames(Multimodal.decodeFeatures(s, assets(s, dir)))
        .select(col("asset_id"), col("media_type"),
          col("sample_idx").cast("int").as("sample_idx"),
          col("frame_idx").cast("long").as("frame_idx"))
    },

    // REAL decode, oracle-gated: deterministic PNGs are synthesized
    // per-partition (dims derived from doc_id by pure integer arithmetic),
    // then the full production still-image path runs on genuine bytes —
    // ImageIO encode → ImageIoDecoder.decode (dims from the actual decoded
    // raster) → ImageIoDecoder.resize (bounding box 16, bilinear,
    // PNG re-encode) → a second real decode of the resized bytes. The
    // oracle replays only the arithmetic; every pixel byte in between is
    // real codec output, so a decode/resize regression breaks the hash.
    QueryDef(
      "q_multimodal_real_decode",
      """WITH d AS (
        |  SELECT doc_id AS asset_id,
        |         CAST(8 + doc_id % 40 AS INT) AS width,
        |         CAST(8 + (doc_id // 7) % 32 AS INT) AS height
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT asset_id, width, height,
        |       CAST(CASE WHEN greatest(width, height) <= 16 THEN width
        |            ELSE greatest(width * 16 // greatest(width, height), 1)
        |            END AS INT) AS out_width,
        |       CAST(CASE WHEN greatest(width, height) <= 16 THEN height
        |            ELSE greatest(height * 16 // greatest(width, height), 1)
        |            END AS INT) AS out_height
        |FROM d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val gen = Tables.documents(s, dir)
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (8 + id % 40).toInt
            val h = (8 + (id / 7) % 32).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            img.setRGB(0, 0, (id * 2654435761L).toInt) // content is irrelevant
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray, "image")
          }
        }.toDF("asset_id", "payload", "media_type")
      val feats = Multimodal.decodeFeatures(s, gen, Multimodal.ImageIoDecoder)
        .select(col("asset_id"), col("width"), col("height"))
      val resized = gen.select(col("asset_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, bytes) =>
            val (outBytes, ow, oh) = Multimodal.ImageIoDecoder.resize(bytes, 16)
            // the reported dims must be what a consumer DECODES, not what
            // the resizer claims — re-decode the re-encoded output
            val verify = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(outBytes))
            require(verify != null && verify.getWidth == ow && verify.getHeight == oh,
              s"resized asset $id round-trip mismatch")
            (id, verify.getWidth, verify.getHeight)
          }
        }.toDF("asset_id", "out_width", "out_height")
      feats.join(resized, "asset_id")
    },

    // REAL audio decode, oracle-gated: deterministic 16-bit PCM is
    // synthesized per-partition (sample i of asset a is
    // ((a*31 + i*17) mod 65536) - 32768, pure integer arithmetic), wrapped
    // in a real WAV container by AudioSystem, then the full production
    // audio path runs on genuine bytes — container parse, format checks,
    // frame count from the parsed header, peak/sum statistics folded over
    // the actual decoded PCM stream. The oracle replays only the synth
    // arithmetic; a misparsed header, wrong endianness, or off-by-one in
    // the sample loop breaks the hash.
    QueryDef(
      "q_multimodal_real_audio",
      """WITH d AS (
        |  SELECT doc_id AS asset_id,
        |         CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
        |         CAST(1 + (doc_id // 5) % 2 AS INT) AS channels,
        |         100 + doc_id % 400 AS nf
        |  FROM documents WHERE doc_id % 25 = 0),
        |s AS (
        |  SELECT asset_id, sample_rate, channels, nf,
        |         UNNEST(range(0, nf * channels)) AS i
        |  FROM d),
        |a AS (
        |  SELECT asset_id, sample_rate, channels, nf,
        |         abs(((asset_id * 31 + i * 17) % 65536) - 32768) AS amp
        |  FROM s)
        |SELECT asset_id, CAST(sample_rate AS INT) AS sample_rate,
        |       CAST(channels AS INT) AS channels,
        |       CAST(nf AS BIGINT) AS n_frames,
        |       CAST(nf * 1000 // sample_rate AS BIGINT) AS duration_ms,
        |       CAST(max(amp) AS INT) AS peak_amp,
        |       CAST(sum(amp) AS BIGINT) AS sum_abs
        |FROM a
        |GROUP BY asset_id, sample_rate, channels, nf""".stripMargin) { (s, dir) =>
      import s.implicits._
      val wavs = Tables.documents(s, dir)
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val sr = if (id % 2 == 0) 8000 else 16000
            val ch = (1 + (id / 5) % 2).toInt
            val nf = (100 + id % 400).toInt
            val pcm = Multimodal.WavCodec.synthPcm16(id, nf * ch)
            (id, Multimodal.WavCodec.encodePcm16(pcm, sr, ch))
          }
        }.toDF("asset_id", "payload")
      Multimodal.decodeAudioFeatures(s, wavs)
    },

    // REAL video decode, oracle-gated: deterministic solid-color frames
    // are JPEG-encoded and wrapped in a real AVI container (RIFF bytes
    // hand-written), then the full production video path runs on genuine
    // bytes — RIFF chunk walk, avih/strh header parse, movi '00dc'
    // enumeration (count REQUIRED to match the header), and a real
    // ImageIO decode of every frame (dims REQUIRED to match the header,
    // pixel (0,0) REQUIRED within JPEG tolerance of the synth color). The
    // oracle replays only the id-derived arithmetic; a misparsed size
    // field, wrong chunk alignment, or frame-count drift breaks the
    // require/hash.
    QueryDef(
      "q_multimodal_real_video",
      """WITH d AS (
        |  SELECT doc_id AS asset_id,
        |         CAST(16 + doc_id % 32 AS INT) AS width,
        |         CAST(16 + (doc_id // 3) % 24 AS INT) AS height,
        |         CAST(10 + doc_id % 20 AS INT) AS fps,
        |         CAST(3 + doc_id % 10 AS INT) AS n_frames
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT asset_id, width, height, fps, n_frames,
        |       CAST(n_frames * 1000 // fps AS BIGINT) AS duration_ms,
        |       n_frames AS frames_decoded
        |FROM d""".stripMargin) { (s, dir) =>
      import s.implicits._
      val avis = Tables.documents(s, dir)
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions { ids =>
          ids.map { id =>
            val w = (16 + id % 32).toInt
            val h = (16 + (id / 3) % 24).toInt
            val fps = (10 + id % 20).toInt
            val nf = (3 + id % 10).toInt
            (id, Multimodal.AviMjpegCodec.encode(id, w, h, fps, nf))
          }
        }.toDF("asset_id", "payload")
      Multimodal.decodeVideoFeatures(s, avis)
        .as[graft.operators.Multimodal.VideoFeatures]
        .map { f =>
          // content-level evidence: every decoded frame's (0,0) pixel must
          // sit within JPEG round-trip tolerance of the synthesized color
          f.frame_rgb00.zipWithIndex.foreach { case (rgb, i) =>
            val (er, eg, eb) = Multimodal.AviMjpegCodec.synthColor(f.asset_id, i)
            val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            require(math.abs(r - er) <= 12 && math.abs(g - eg) <= 12 &&
              math.abs(b - eb) <= 12,
              s"asset ${f.asset_id} frame $i: decoded ($r,$g,$b) far from " +
                s"synth ($er,$eg,$eb)")
          }
          (f.asset_id, f.width, f.height, f.fps, f.n_frames, f.duration_ms,
            f.frames_decoded)
        }
        .toDF("asset_id", "width", "height", "fps", "n_frames", "duration_ms",
          "frames_decoded")
    },

    // Resize plan: bounding-box 224 preserving aspect ratio, integer
    // arithmetic only — the dims a real codec would be handed.
    QueryDef(
      "q_multimodal_resize",
      s"""WITH $decodeSql
         |SELECT asset_id, width, height,
         |       CAST(CASE WHEN greatest(width, height) <= 224 THEN width
         |            ELSE greatest(1, CAST(width AS BIGINT) * 224 // greatest(width, height))
         |            END AS INT) AS out_width,
         |       CAST(CASE WHEN greatest(width, height) <= 224 THEN height
         |            ELSE greatest(1, CAST(height AS BIGINT) * 224 // greatest(width, height))
         |            END AS INT) AS out_height
         |FROM f""".stripMargin) { (s, dir) =>
      Multimodal.resizePlan(Multimodal.decodeFeatures(s, assets(s, dir)), maxDim = 224)
        .select("asset_id", "width", "height", "out_width", "out_height")
    })
}
