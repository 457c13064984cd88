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

  /** Decoder contract: one object per codec family, initialized once per
    * partition by `decodeFeatures`, rows streamed through it. Serializable
    * because the singleton ships inside the mapPartitions closure.
    */
  trait AssetDecoder extends Serializable {
    def decode(assetId: Long, payload: Array[Byte], mediaType: String): AssetFeatures
  }

  /** Deterministic stand-in for a real codec: all "decoded" properties are
    * pure functions of the payload bytes, so results are reproducible and
    * oracle-checkable. A real implementation replaces ONLY this object.
    */
  object StubDecoder extends AssetDecoder {
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

  /** REAL image decode via `javax.imageio` — PNG/JPEG/BMP/GIF ship with
    * the JDK, zero external jars, fully headless. Dimensions come from the
    * actual decoded raster, so this is a working production decode path
    * for the still-image media types; only video/audio remain stubbed
    * (no codecs in the JDK). Corrupt or unsupported bytes fail LOUDLY
    * (ImageIO returns null, we throw) — a curation pipeline must count
    * undecodable assets, not silently fabricate metadata for them.
    */
  object ImageIoDecoder extends AssetDecoder {
    def decode(assetId: Long, payload: Array[Byte], mediaType: String): AssetFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null,
        s"asset $assetId ($mediaType, ${payload.length} bytes): not a decodable image")
      AssetFeatures(assetId, payload.length, mediaType,
        img.getWidth, img.getHeight, n_frames = 1, sampled_frames = Seq(0))
    }

    /** Real resize to the `resizePlan` bounding box: decode → Graphics2D
      * bilinear scale → PNG re-encode. Pure JDK, runs inside the same
      * partition-local batch as decode at scale. Returns the re-encoded
      * bytes plus the output dims (which match `resizePlan`'s integer
      * arithmetic for the same inputs).
      */
    def resize(payload: Array[Byte], maxDim: Int): (Array[Byte], Int, Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"resize input (${payload.length} bytes) not decodable")
      val (w, h) = (img.getWidth, img.getHeight)
      val longest = math.max(w, h)
      val (ow, oh) =
        if (longest <= maxDim) (w, h)
        else ((w.toLong * maxDim / longest).toInt.max(1),
              (h.toLong * maxDim / longest).toInt.max(1))
      val out = new java.awt.image.BufferedImage(ow, oh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      (bos.toByteArray, ow, oh)
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
    // for width > Int.MaxValue/maxDim — cast the operand, not the product.
    // Clamp to >= 1 like ImageIoDecoder.resize: an extreme aspect ratio
    // (1 x 4000 at maxDim 224) otherwise plans a zero-pixel dimension that
    // the codec twin refuses (BufferedImage(0, h) throws)
    val longest = greatest(col("width"), col("height"))
    features.withColumn("out_width",
        when(longest <= maxDim, col("width"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(width AS BIGINT) * $maxDim div greatest(width, height)").cast("int"))))
      .withColumn("out_height",
        when(longest <= maxDim, col("height"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(height AS BIGINT) * $maxDim div greatest(width, height)").cast("int"))))
  }

  /** Partition-local batch decode: one decoder per partition, rows
    * streamed. The repartition bound keeps each decode batch within
    * executor memory no matter the table size. The decoder is pluggable —
    * `StubDecoder` for the oracle queries, `ImageIoDecoder` for real
    * still-image bytes (MultimodalRealSpec drives real PNGs through this
    * exact path) — and the plan shape is identical either way.
    */
  def decodeFeatures(spark: SparkSession, assets: DataFrame,
                     decoder: AssetDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // stateful codecs initialize per-partition state here (JNI context etc.)
        rows.map { case (id, bytes, mt) =>
          // assetSchema allows a null payload; both decoders would NPE on
          // it with no asset id — name the poison row instead
          require(bytes != null, s"asset $id ($mt): null payload")
          decoder.decode(id, bytes, mt)
        }
      }
      .toDF()
  }
}
