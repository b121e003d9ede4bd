package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binary payload plumbing: fromDocuments -> batched decode with FakeDecoder") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val media = Multimodal.fromDocuments(spark, docs)
    val decoded = Multimodal.decodeAll(spark, media, Multimodal.FakeDecoder, batchSize = 16)
    val rows = decoded.collect()
    assert(rows.length == docs.count())
    // deterministic fake decode matches the mm_meta oracle arithmetic
    val d0 = rows.find(_.doc_id == 0L).get
    assert(d0.width == (64 + d0.n_bytes % 64).toInt)
    assert(d0.height == (64 + (d0.n_bytes * 7) % 64).toInt)
    assert(d0.n_frames == (1 + d0.n_bytes % 24).toInt)
    assert(d0.features.length == 8)
    assert(Set("image", "audio", "video").contains(d0.media_type))
  }

  test("repartitionByBytes sizes partitions by payload bytes, not row count") {
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val media = Multimodal.fromDocuments(spark, docs)
    val repart = Multimodal.repartitionByBytes(spark, media, targetBytes = 4096)
    assert(repart.rdd.getNumPartitions >= 2)
    assert(repart.count() == media.count())
  }

  test("resize rescales dims and feature magnitudes; sampleFrames is evenly spaced") {
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(10)
    val decoded = Multimodal.decodeAll(spark,
      Multimodal.fromDocuments(spark, docs), Multimodal.FakeDecoder)
    val resized = Multimodal.resize(spark, decoded, 224, 224).collect()
    assert(resized.forall(m => m.width == 224 && m.height == 224))
    assert(Multimodal.sampleFrames(10, 3) == Seq(0, 4, 9))
    assert(Multimodal.sampleFrames(1, 3) == Seq(0))
    assert(Multimodal.sampleFrames(0, 3).isEmpty)
  }

  test("CodecDecoder handles empty batches (MJPEG leg lives in VideoBytesSpec)") {
    assert(Multimodal.CodecDecoder.decode(Seq.empty).isEmpty)
  }

  // real WAV bytes, written by the JDK's own javax.sound.sampled encoder:
  // 1 s of a 440 Hz sine at half scale, 8 kHz mono 16-bit PCM little-endian
  private def wavBytes(rate: Float = 8000f, channels: Int = 1, amp: Double = 0.5): Array[Byte] = {
    val n = rate.toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n; c <- 0 until channels) {
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt
      val o = (i * channels + c) * 2
      pcm(o) = (v & 0xff).toByte
      pcm(o + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("AudioBytes sniffs WAV/RIFF meta: rate, channels, depth, duration") {
    val m = AudioBytes.wavMeta(wavBytes()).get
    assert(m.audioFormat == 1 && m.channels == 1 && m.sampleRate == 8000 && m.bitsPerSample == 16)
    assert(m.nFrames == 8000L)
    assert(math.abs(m.durationSec - 1.0) < 1e-9)
    val stereo = AudioBytes.wavMeta(wavBytes(rate = 16000f, channels = 2)).get
    assert(stereo.channels == 2 && stereo.sampleRate == 16000 && stereo.nFrames == 16000L)
    // a header-only prefix still yields full meta (duration from declared size)
    val prefix = AudioBytes.wavMeta(wavBytes().take(64)).get
    assert(prefix.sampleRate == 8000 && math.abs(prefix.durationSec - 1.0) < 1e-9)
    // non-WAV bytes sniff to None, never throw
    assert(AudioBytes.wavMeta("just some text".getBytes("UTF-8")).isEmpty)
    assert(AudioBytes.wavMeta(Array.empty[Byte]).isEmpty)
  }

  test("RiffAudioDecoder really decodes PCM samples: RMS of a known sine") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", wavBytes()),
      Multimodal.MediaRecord(2L, "audio", "not audio".getBytes("UTF-8")))
    val out = Multimodal.RiffAudioDecoder.decode(recs).sortBy(_.doc_id)
    assert(out(0).width == 8000 && out(0).height == 1 && out(0).n_frames == 8000)
    // RMS of a half-scale sine = 0.5 / sqrt(2) in every time segment
    assert(out(0).features.length == 8)
    out(0).features.foreach(f => assert(math.abs(f - 0.5 / math.sqrt(2)) < 1e-3, f))
    // non-WAV payload degrades to zero metadata, not a failure
    assert(out(1).width == 0 && out(1).features.isEmpty)
  }

  test("sniffMeta routes WAV audio alongside images") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", imageBytes("png")),
      Multimodal.MediaRecord(2L, "audio", wavBytes(rate = 44100f, channels = 2)))
    val meta = Multimodal.sniffMeta(spark, spark.createDataset(recs)).collect().sortBy(_.doc_id)
    assert(meta(0).format == "png")
    assert(meta(1).format == "wav" && meta(1).width == 44100 && meta(1).height == 2)
  }

  // real image bytes, generated with the JDK's own encoder — no external libs
  private def imageBytes(format: String, w: Int = 20, h: Int = 10): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"JDK cannot encode $format")
    out.toByteArray
  }

  test("ImageHeaders sniffs PNG/JPEG/GIF/BMP dimensions from raw bytes") {
    assert(ImageHeaders.pngDims(imageBytes("png")).contains((20, 10)))
    assert(ImageHeaders.jpegDims(imageBytes("jpg")).contains((20, 10)))
    assert(ImageHeaders.gifDims(imageBytes("gif")).contains((20, 10)))
    assert(ImageHeaders.bmpDims(imageBytes("bmp")).contains((20, 10)))
    assert(ImageHeaders.sniff(imageBytes("png")).contains(("png", 20, 10)))
    assert(ImageHeaders.sniff(imageBytes("jpg")).exists(_._1 == "jpeg"))
    // non-image bytes sniff to None, never throw
    assert(ImageHeaders.sniff("just some text".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaders.sniff(Array.empty[Byte]).isEmpty)
  }

  test("ImageIoDecoder really decodes pixels: true dims + luminance histogram") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", imageBytes("png")),
      Multimodal.MediaRecord(2L, "image", imageBytes("jpg", w = 33, h = 7)),
      Multimodal.MediaRecord(3L, "image", "corrupt payload".getBytes("UTF-8")))
    val out = Multimodal.ImageIoDecoder.decode(recs).sortBy(_.doc_id)
    assert(out(0).width == 20 && out(0).height == 10 && out(0).n_frames == 1)
    // 50/50 checkerboard: half the pixels in the darkest bin, half in the lightest
    assert(math.abs(out(0).features(0) - 0.5f) < 1e-6)
    assert(math.abs(out(0).features(7) - 0.5f) < 1e-6)
    assert(math.abs(out(0).features.sum - 1.0f) < 1e-5)
    assert(out(1).width == 33 && out(1).height == 7)
    // corrupt payload degrades to sniffed/zero metadata, not a failure
    assert(out(2).width == 0 && out(2).n_frames == 0 && out(2).features.isEmpty)
  }

  test("sniffMeta is the codec-free pre-filter over a distributed Dataset") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", imageBytes("png", w = 300, h = 200)),
      Multimodal.MediaRecord(2L, "image", imageBytes("png", w = 8, h = 8)),
      Multimodal.MediaRecord(3L, "audio", "not an image".getBytes("UTF-8")))
    val meta = Multimodal.sniffMeta(spark, spark.createDataset(recs)).collect().sortBy(_.doc_id)
    assert(meta(0).format == "png" && meta(0).width == 300)
    assert(meta(2).format == "unknown" && meta(2).width == 0)
    // the pre-filter in action: keep only images >= 64px wide
    val kept = Multimodal.sniffMeta(spark, spark.createDataset(recs))
      .filter(m => m.format != "unknown" && m.width >= 64).collect()
    assert(kept.map(_.doc_id).toSeq == Seq(1L))
  }

  test("full image path: distributed ImageIoDecoder over generated images") {
    import spark.implicits._
    val recs = (1L to 50L).map(i =>
      Multimodal.MediaRecord(i, "image", imageBytes("png", w = 16 + (i % 8).toInt, h = 12)))
    val decoded = Multimodal.decodeAll(spark, spark.createDataset(recs),
      Multimodal.ImageIoDecoder, batchSize = 8).collect()
    assert(decoded.length == 50)
    assert(decoded.forall(d => d.height == 12 && d.n_frames == 1 && d.features.length == 8))
  }
}
