package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as partition-local batch operators.
  *
  * Image decode (`ImageIoDecoder`), audio decode (`WavCodec`), and video
  * decode (`AviMjpegCodec` — MJPEG-in-AVI: RIFF container parsed at the
  * byte level, frames decoded as real JPEGs) are all REAL JDK codec
  * paths; inter-frame codecs (H.264 etc.) remain environmental (no JDK
  * codec, swap in a JNI/FFmpeg frame decode). `StubDecoder` derives
  * deterministic pseudo-metadata from the bytes' md5 for the mixed-media
  * oracle queries. Everything around the decoders — the schema contract,
  * the mapPartitions batch shape (decoder state initialized once per
  * partition, rows streamed through it), the partitioning — is the real
  * 100 TB plumbing.
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
    * for the still-image media types (audio has its own real path in
    * `WavCodec`). Corrupt or unsupported bytes fail LOUDLY
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

  /** Features from a real audio decode: container-level metadata plus two
    * content statistics (peak amplitude, sum of absolute sample values)
    * computed from the actual decoded PCM stream — so an oracle replaying
    * the synth arithmetic breaks if the decode ever misparses a byte.
    */
  case class AudioFeatures(
      asset_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      peak_amp: Int,
      sum_abs: Long)

  /** REAL audio codec via `javax.sound.sampled` — WAV/PCM ships with the
    * JDK (pure container parsing, no audio hardware needed), zero external
    * jars. Corrupt or non-PCM bytes fail LOUDLY, same posture as
    * ImageIoDecoder.
    */
  object WavCodec {

    /** Deterministic 16-bit PCM: sample i is
      * `((assetId*31 + i*17) mod 65536) - 32768` — pure integer
      * arithmetic an oracle can replay per sample.
      */
    def synthPcm16(assetId: Long, totalSamples: Int): Array[Byte] = {
      val pcm = new Array[Byte](totalSamples * 2)
      var i = 0
      while (i < totalSamples) {
        val s = (((assetId * 31L + i.toLong * 17L) % 65536L) - 32768L).toInt
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      pcm
    }

    /** Wrap raw 16-bit little-endian signed PCM in a real WAV container
      * (AudioSystem writes the RIFF header + fmt/data chunks).
      */
    def encodePcm16(pcm: Array[Byte], sampleRate: Int, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt,
        (pcm.length / fmt.getFrameSize).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real decode: AudioSystem parses the container, then every PCM
      * sample is read and folded into peak/sum statistics. Refuses
      * anything that is not 16-bit little-endian signed PCM rather than
      * guessing at a sample layout it would silently misread.
      */
    def decode(assetId: Long, payload: Array[Byte]): AudioFeatures = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"asset $assetId (${payload.length} bytes): not a decodable audio container", e)
        }
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            && fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"asset $assetId: unsupported audio format $fmt (need 16-bit LE signed PCM)")
        val nFrames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var i = 0; var peak = 0; var sum = 0L
        while (i + 1 < bytes.length) {
          val s = (bytes(i) & 0xff) | (bytes(i + 1).toInt << 8)
          val a = math.abs(s)
          if (a > peak) peak = a
          sum += a
          i += 2
        }
        val sr = fmt.getSampleRate.toInt
        AudioFeatures(assetId, sr, fmt.getChannels, nFrames,
          nFrames * 1000L / sr, peak, sum)
      } finally ais.close()
    }
  }

  /** Features from a real video decode: container-level metadata parsed
    * from the AVI headers, plus per-frame evidence from genuinely decoding
    * the MJPEG frame bytes (dims of every decoded frame are checked
    * against the container header; `rgb00` samples pixel (0,0) of each
    * decoded frame so content-level checks are possible upstream).
    */
  case class VideoFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      fps: Int,
      n_frames: Int,
      duration_ms: Long,
      frames_decoded: Int,
      frame_rgb00: Seq[Int])

  /** REAL video codec: MJPEG-in-AVI, pure JDK. AVI is a plain RIFF chunk
    * container (12-byte header + fourcc/size chunks) and MJPEG frames are
    * ordinary JPEGs — so a byte-level RIFF writer/parser plus
    * `javax.imageio` gives a genuine end-to-end video path with zero
    * external jars: real container bytes, real lossy frame encode, real
    * frame decode. Inter-frame codecs (H.264 etc.) remain environmental —
    * no JDK codec — but the plumbing is codec-agnostic: swap the frame
    * decode call and nothing else changes. Corrupt containers, truncated
    * movi data, or header/chunk-count mismatches fail LOUDLY, same
    * posture as ImageIoDecoder/WavCodec.
    */
  object AviMjpegCodec {

    private val FpsScale = 1 // strh dwScale; dwRate = fps

    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** Deterministic solid-color frame: channel values are pure functions
      * of (assetId, frameIdx) kept inside [28, 227] so JPEG round-trip
      * error never clips at 0/255.
      */
    def synthColor(assetId: Long, frameIdx: Int): (Int, Int, Int) = (
      (28 + (assetId * 7L + frameIdx * 13L) % 200L).toInt,
      (28 + (assetId * 11L + frameIdx * 17L) % 200L).toInt,
      (28 + (assetId * 13L + frameIdx * 19L) % 200L).toInt)

    /** Encode `nFrames` synthesized solid-color frames as real JPEGs and
      * wrap them in a real AVI container (RIFF → hdrl(avih, strl(strh
      * 'vids'/'MJPG', strf BITMAPINFOHEADER)) → movi('00dc' chunks)).
      */
    def encode(assetId: Long, width: Int, height: Int, fps: Int,
               nFrames: Int, recWrap: Boolean = false): Array[Byte] = {
      // fail loudly like decode does: fps <= 0 would otherwise surface as a
      // raw ArithmeticException from the 1000000/fps mspf field, and
      // fps > 1000 truncates mspf to 0 and cannot round-trip through decode
      require(fps > 0 && fps <= 1000, s"fps must be in [1, 1000], got $fps")
      val jpegs = (0 until nFrames).map { i =>
        val (r, g, b) = synthColor(assetId, i)
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gr = img.createGraphics()
        try { gr.setColor(new java.awt.Color(r, g, b)); gr.fillRect(0, 0, width, height) }
        finally gr.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer")
        bos.toByteArray
      }
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
        fourcc(id) ++ le32(body.length) ++ body ++ pad
      }
      def list(id: String, body: Array[Byte]): Array[Byte] =
        fourcc("LIST") ++ le32(4 + body.length) ++ fourcc(id) ++ body
      val maxBuf = jpegs.map(_.length).max
      val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(maxBuf) ++
        le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(FpsScale) ++ le32(fps) ++ le32(0) ++ le32(nFrames) ++
        le32(maxBuf) ++ le32(-1) ++ le32(0) ++
        le32(0) ++ le32(width << 16 | height) // rcFrame (packed, informational)
      val strf = le32(40) ++ le32(width) ++ le32(height) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ fourcc("MJPG") ++
        le32(width * height * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      // recWrap: group the frame chunks in a 'rec ' LIST, the interleave
      // grouping many real-world AVIs use inside movi — the decoder must
      // see through it
      val frameChunks = jpegs.flatMap(j => chunk("00dc", j)).toArray
      val movi = list("movi", if (recWrap) list("rec ", frameChunks) else frameChunks)
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    private def rd32(b: Array[Byte], off: Int): Int = {
      require(off + 4 <= b.length, s"truncated container at offset $off")
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    }

    private def cc(b: Array[Byte], off: Int): String = {
      require(off + 4 <= b.length, s"truncated container at offset $off")
      new String(b, off, 4, "US-ASCII")
    }

    /** Real decode: parse the RIFF structure, read dims/fps/frame count
      * from the avih+strh headers, walk every '00dc' chunk in movi, and
      * decode each sampled frame's JPEG bytes with ImageIO — requiring the
      * decoded raster dims to match the container header, and the movi
      * chunk count to match avih's dwTotalFrames. `sampleEvery` decodes
      * every k-th frame (a 100 TB pipeline rarely needs all frames);
      * metadata and chunk-count validation always cover the whole file.
      */
    def decode(assetId: Long, payload: Array[Byte],
               sampleEvery: Int = 1): VideoFeatures = {
      require(payload.length >= 12 && cc(payload, 0) == "RIFF" &&
        cc(payload, 8) == "AVI ",
        s"asset $assetId (${payload.length} bytes): not an AVI container")
      val riffEnd = 8 + rd32(payload, 4)
      require(riffEnd <= payload.length, s"asset $assetId: RIFF size past EOF")
      var off = 12
      var width = -1; var height = -1; var fps = -1; var totalFrames = -1
      var hasDib = false
      var frameOffsets = List.empty[(Int, Int)] // (offset, len) of 00dc bodies
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = cc(payload, p); val sz = rd32(payload, p + 4)
          val body = p + 8
          // sz is unsigned on disk: a negative read means a >2 GiB or
          // corrupt size field — reject it BEFORE the bounds check, whose
          // int arithmetic a negative/huge sz would slip past (and a
          // negative sz makes the loop cursor stop advancing: an
          // infinite-loop DoS, not a loud failure)
          require(sz >= 0, s"asset $assetId: chunk $id has negative size $sz")
          require(body.toLong + sz <= end,
            s"asset $assetId: chunk $id overruns its parent")
          if (id == "LIST") {
            val listId = cc(payload, body)
            // 'rec ' LISTs group interleaved frame chunks INSIDE movi
            // (common in real AVIs) — their content is still movi content
            walk(body + 4, body + sz,
              inMovi = listId == "movi" || (inMovi && listId == "rec "))
          } else if (id == "avih") {
            require(sz >= 40, s"asset $assetId: avih too short ($sz)")
            fps = { val mspf = rd32(payload, body); require(mspf > 0, "bad rate"); 1000000 / mspf }
            totalFrames = rd32(payload, body + 16)
            width = rd32(payload, body + 32)
            height = rd32(payload, body + 36)
          } else if (inMovi && (id == "00dc" || id == "00db")) {
            // frames of the FIRST stream only ('00dc' compressed / '00db'
            // uncompressed): a second stream's '01dc' chunks must not
            // count against stream 00's header dims or dwTotalFrames
            if (id == "00db") hasDib = true
            frameOffsets ::= (body, sz)
          }
          p = body + sz + (sz % 2) // chunks are word-aligned
        }
      }
      walk(12, riffEnd, inMovi = false) // chunks start after the 'AVI ' form fourcc
      require(width > 0 && height > 0 && fps > 0 && totalFrames >= 0,
        s"asset $assetId: missing or invalid avih header")
      // refuse UPFRONT with the real reason: raw-DIB frames would count
      // in n_frames but can never pass the JPEG frame decode below — a
      // misleading per-frame error (or, with sampleEvery > 1, silently
      // unsupported unsampled frames) is worse than a named rejection
      require(!hasDib,
        s"asset $assetId: stream 00 contains uncompressed DIB ('00db') " +
          "frames — this decoder supports MJPEG only")
      val frames = frameOffsets.reverse.toVector
      require(frames.length == totalFrames,
        s"asset $assetId: avih says $totalFrames frames, movi has ${frames.length}")
      val sampled = frames.indices.by(math.max(1, sampleEvery))
      val rgb00 = sampled.map { i =>
        val (fo, fl) = frames(i)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, fo, fl))
        require(img != null, s"asset $assetId frame $i: not a decodable JPEG")
        require(img.getWidth == width && img.getHeight == height,
          s"asset $assetId frame $i: ${img.getWidth}x${img.getHeight} != header ${width}x$height")
        img.getRGB(0, 0) & 0xffffff
      }
      VideoFeatures(assetId, width, height, fps, totalFrames,
        totalFrames.toLong * 1000L / fps, rgb00.length, rgb00.toVector)
    }
  }

  /** Partition-local batch video decode — the video twin of
    * `decodeFeatures`: same mapPartitions shape, the real AVI/MJPEG parser
    * streamed over the rows.
    */
  def decodeVideoFeatures(spark: SparkSession, assets: DataFrame,
                          sampleEvery: Int = 1): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          require(bytes != null, s"asset $id: null video payload")
          AviMjpegCodec.decode(id, bytes, sampleEvery)
        }
      }
      .toDF()
  }

  /** Partition-local batch audio decode — the audio twin of
    * `decodeFeatures`: same mapPartitions shape, decoder state per
    * partition, rows streamed through the real WAV parser.
    */
  def decodeAudioFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          require(bytes != null, s"asset $id: null audio payload")
          WavCodec.decode(id, bytes)
        }
      }
      .toDF()
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
