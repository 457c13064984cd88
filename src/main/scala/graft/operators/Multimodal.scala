package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-local batch operators.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): `StubDecoder` derives deterministic pseudo-metadata from the
  * bytes' md5. Everything around it — the schema contract, the
  * mapPartitions batch shape (decoder state initialized once per
  * partition, rows streamed through it), the partitioning — is the real
  * 100 TB plumbing: swap `StubDecoder.decode` for a JNI/FFmpeg call and
  * nothing else changes.
  */
object Multimodal {

  /** Schema contract for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true)))

  /** Extracted features; `frames` models frame-sampling output. */
  case class AssetFeatures(
      asset_id: Long,
      n_bytes: Int,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sampled_frames: Seq[Int])

  /** Deterministic stand-in for a real codec: all "decoded" properties are
    * pure functions of the payload bytes, so results are reproducible and
    * oracle-checkable. A real implementation replaces ONLY this object.
    */
  object StubDecoder {
    def decode(assetId: Long, payload: Array[Byte], mediaType: String): AssetFeatures = {
      // 60-bit md5-prefix hash of the payload bytes — the same basis as
      // TextOps.hash64, so an oracle can replay it from the source text.
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val hex = md.map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val width = 64 + (h % 1856L).toInt
      val height = 64 + ((h / 1856L) % 1016L).toInt
      val nFrames = if (mediaType == "video") 1 + (h % 120L).toInt else 1
      val step = math.max(1, nFrames / 4)
      AssetFeatures(assetId, payload.length, mediaType, width, height, nFrames,
        (0 until nFrames by step).take(8))
    }
  }

  /** Per-frame fan-out: one row per sampled frame, ready for per-frame
    * featurization (the map side of a frame-level pipeline). Partitioning
    * by asset keeps a video's frames co-located for stateful codecs.
    */
  def explodeFrames(features: DataFrame): DataFrame =
    features.select(col("asset_id"), col("media_type"),
      posexplode(col("sampled_frames")).as(Seq("sample_idx", "frame_idx")))

  /** Resize plan: target bounding box `maxDim` preserving aspect ratio.
    * Pure integer arithmetic ((dim * maxDim) div longest side) so the plan
    * is engine-exact; a real implementation feeds these dims to the codec.
    * Output adds (out_width, out_height).
    */
  def resizePlan(features: DataFrame, maxDim: Int): DataFrame = {
    // widen BEFORE multiplying: width * maxDim in 32-bit wraps silently
    // for width > Int.MaxValue/maxDim — cast the operand, not the product
    val longest = greatest(col("width"), col("height"))
    features.withColumn("out_width",
        when(longest <= maxDim, col("width"))
          .otherwise(expr(s"CAST(width AS BIGINT) * $maxDim div greatest(width, height)").cast("int")))
      .withColumn("out_height",
        when(longest <= maxDim, col("height"))
          .otherwise(expr(s"CAST(height AS BIGINT) * $maxDim div greatest(width, height)").cast("int")))
  }

  /** Partition-local batch decode: one decoder per partition, rows
    * streamed. The repartition bound keeps each decode batch within
    * executor memory no matter the table size.
    */
  def decodeFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // real codecs initialize per-partition state here (JNI context etc.)
        rows.map { case (id, bytes, mt) => StubDecoder.decode(id, bytes, mt) }
      }
      .toDF()
  }
}
