package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.Row

import graft.SparkSpec

/** The REAL decode paths: in-test ImageIO-generated PNG/JPEG/BMP bytes,
  * AudioSystem-wrapped WAV/PCM, and hand-written AVI/MJPEG containers, all
  * driven through the SAME mapPartitions plumbing the stub uses — only the
  * decoder object differs. This is the evidence that the multimodal
  * surface is real plumbing + pluggable codecs across all three
  * modalities (inter-frame video codecs like H.264 stay environmental).
  */
class MultimodalRealSpec extends SparkSpec {

  /** Encode a solid-color w×h image with the given ImageIO format. */
  private def imageBytes(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no ImageIO writer for $fmt")
    bos.toByteArray
  }

  test("ImageIoDecoder decodes real PNG/JPEG/BMP bytes via decodeFeatures") {
    val dims = Seq((1L, 320, 200, "png"), (2L, 17, 43, "jpg"), (3L, 64, 64, "bmp"))
    val rows = dims.map { case (id, w, h, fmt) =>
      Row(id, imageBytes(w, h, 0x3366cc, fmt), s"image/$fmt")
    }
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.assetSchema)
    val got = Multimodal
      .decodeFeatures(spark, assets, Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getAs[Long]("asset_id"),
        r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("n_frames"))).toSet
    assert(got == dims.map { case (id, w, h, _) => (id, w, h, 1) }.toSet)
  }

  test("ImageIoDecoder fails loudly on undecodable bytes") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(9L, Array[Byte](1, 2, 3, 4), "image/png")
    }
    assert(e.getMessage.contains("asset 9"))
  }

  test("WavCodec round-trips real WAV bytes with exact sample statistics") {
    // hand-checkable 4-sample mono clip: s(i) = ((7*31 + i*17) % 65536) - 32768
    //   i=0: 217-32768 = -32551; i=1: -32534; i=2: -32517; i=3: -32500
    val pcm = Multimodal.WavCodec.synthPcm16(7L, 4)
    val wav = Multimodal.WavCodec.encodePcm16(pcm, 8000, 1)
    // a real RIFF/WAVE container came out
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val f = Multimodal.WavCodec.decode(7L, wav)
    assert(f.sample_rate == 8000 && f.channels == 1 && f.n_frames == 4L)
    assert(f.duration_ms == 0L) // 4 frames * 1000 / 8000 rounds down
    assert(f.peak_amp == 32551)
    assert(f.sum_abs == 32551L + 32534L + 32517L + 32500L)
  }

  test("WavCodec handles stereo through the decodeAudioFeatures plumbing") {
    import org.apache.spark.sql.functions._
    val rows = Seq(11L, 12L).map { id =>
      val (sr, ch, nf) = (16000, 2, 50)
      val wav = Multimodal.WavCodec.encodePcm16(
        Multimodal.WavCodec.synthPcm16(id, nf * ch), sr, ch)
      (id, wav)
    }
    val df = spark.createDataFrame(rows).toDF("asset_id", "payload")
      .repartition(2)
    val got = Multimodal.decodeAudioFeatures(spark, df)
      .select("asset_id", "sample_rate", "channels", "n_frames", "duration_ms")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    // 50 frames at 16 kHz = 3.125 ms -> 3 ms integer
    assert(got == Set((11L, 16000, 2, 50L, 3L), (12L, 16000, 2, 50L, 3L)))
  }

  test("WavCodec fails loudly on garbage and on non-16-bit PCM") {
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(9L, Array[Byte](1, 2, 3, 4))
    }
    assert(e1.getMessage.contains("asset 9"))
    // an 8-bit WAV is a valid container but the wrong sample layout:
    // refuse rather than misread
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3, 4)), fmt8, 4L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(10L, bos.toByteArray)
    }
    assert(e2.getMessage.contains("unsupported audio format"))
  }

  test("real resize matches resizePlan's dims and preserves pixel content") {
    import org.apache.spark.sql.functions._
    val bytes = imageBytes(200, 100, 0x00ff00, "png")
    val (outBytes, ow, oh) = Multimodal.ImageIoDecoder.resize(bytes, 50)
    assert((ow, oh) == (50, 25))
    // the integer arithmetic of the declarative resizePlan agrees
    val planned = Multimodal.resizePlan(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, 4242, "image/png", 200, 100, 1, Seq(0)))),
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.Encoders.product[Multimodal.AssetFeatures].schema)),
      maxDim = 50)
      .select(col("out_width"), col("out_height")).head
    assert((planned.getInt(0), planned.getInt(1)) == (ow, oh))
    // re-decoded output: right dims, solid green survived the scale
    val out = ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(out.getWidth == 50 && out.getHeight == 25)
    assert((out.getRGB(25, 12) & 0xffffff) == 0x00ff00)
    // an image already inside the box is not upscaled
    val (_, sw, sh) = Multimodal.ImageIoDecoder.resize(imageBytes(30, 20, 0, "png"), 50)
    assert((sw, sh) == (30, 20))
  }

  // ----- AVI/MJPEG video -----

  test("AviMjpegCodec round-trips container metadata and frame content") {
    val bytes = Multimodal.AviMjpegCodec.encode(42L, 48, 32, 25, 7)
    val f = Multimodal.AviMjpegCodec.decode(42L, bytes)
    assert((f.width, f.height, f.fps, f.n_frames) == (48, 32, 25, 7))
    assert(f.duration_ms == 7L * 1000 / 25)
    assert(f.frames_decoded == 7 && f.frame_rgb00.length == 7)
    // every decoded frame's pixel (0,0) within JPEG tolerance of the synth
    f.frame_rgb00.zipWithIndex.foreach { case (rgb, i) =>
      val (er, eg, eb) = Multimodal.AviMjpegCodec.synthColor(42L, i)
      assert(math.abs(((rgb >> 16) & 0xff) - er) <= 12, s"frame $i R")
      assert(math.abs(((rgb >> 8) & 0xff) - eg) <= 12, s"frame $i G")
      assert(math.abs((rgb & 0xff) - eb) <= 12, s"frame $i B")
    }
    // sampled decode still validates the whole container but decodes fewer
    val s2 = Multimodal.AviMjpegCodec.decode(42L, bytes, sampleEvery = 3)
    assert(s2.n_frames == 7 && s2.frames_decoded == 3) // frames 0, 3, 6
  }

  test("AviMjpegCodec fails loudly on corrupt, truncated, or lying containers") {
    // not RIFF at all
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode(9L, Array.fill[Byte](64)(7))
    }
    assert(e1.getMessage.contains("not an AVI container"))
    val good = Multimodal.AviMjpegCodec.encode(9L, 24, 16, 10, 3)
    // truncated mid-movi: the RIFF size field now points past EOF
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode(9L, good.take(good.length - 40))
    }
    assert(e2.getMessage.contains("RIFF size past EOF"))
    // header lies about the frame count: flip avih.dwTotalFrames (16 bytes
    // into the avih body) from 3 to 4 — chunk-count validation must catch it
    val tampered = good.clone()
    val avihAt = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "avih").get
    tampered(avihAt + 8 + 16) = 4.toByte
    val e3 = intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode(9L, tampered)
    }
    assert(e3.getMessage.contains("avih says 4 frames, movi has 3"))
    // a negative chunk-size field (0xFFFFFFF8 = -8) must throw, not spin:
    // without the sz >= 0 guard the walk cursor stops advancing — an
    // infinite loop on hostile input instead of a loud failure
    val negSz = good.clone()
    val dcAt = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "00dc").get
    negSz(dcAt + 4) = 0xf8.toByte; negSz(dcAt + 5) = 0xff.toByte
    negSz(dcAt + 6) = 0xff.toByte; negSz(dcAt + 7) = 0xff.toByte
    val e4 = intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode(9L, negSz)
    }
    assert(e4.getMessage.contains("negative size"))
  }

  test("AviMjpegCodec sees through 'rec ' interleave LISTs inside movi") {
    // many real-world AVIs group frame chunks in 'rec ' LISTs — the
    // parser must treat their content as movi content, not skip it
    val bytes = Multimodal.AviMjpegCodec.encode(7L, 24, 16, 10, 4, recWrap = true)
    val f = Multimodal.AviMjpegCodec.decode(7L, bytes)
    assert(f.n_frames == 4 && f.frames_decoded == 4)
    assert((f.width, f.height, f.fps) == (24, 16, 10))
  }

  test("decodeVideoFeatures runs the real AVI parser through the batch plumbing") {
    import spark.implicits._
    val assets = Seq(1L, 2L, 3L, 4L).map(id =>
        (id, Multimodal.AviMjpegCodec.encode(id, 20 + id.toInt, 16, 12, 2 + id.toInt)))
      .toDF("asset_id", "payload").repartition(2)
    val got = Multimodal.decodeVideoFeatures(spark, assets)
      .collect().map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("width"),
        r.getAs[Int]("n_frames"))).toSet
    assert(got == Set((1L, 21, 3), (2L, 22, 4), (3L, 23, 5), (4L, 24, 6)))
  }
}
