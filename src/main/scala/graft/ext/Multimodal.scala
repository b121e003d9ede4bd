package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-local batches.
  *
  * The container ships no image/audio codecs, so the decode step is an
  * injectable strategy: [[FakeDecoder]] is a deterministic stand-in used by
  * tests and the `mm_meta` query; [[CodecDecoder]] marks where a real codec
  * (JNI/javacv) would plug in. Everything around the decoder — schema,
  * Dataset encoders, batch shape, partition sizing — is real and tested.
  *
  * Scale notes: decode is embarrassingly parallel per partition;
  * `repartitionByBytes` sizes partitions so one decode batch fits executor
  * memory (payloads can be MBs each — row-count partitioning is wrong for
  * media). The batched `mapPartitions` shape matches how a vectorized-UDF
  * runtime would feed an accelerator: fixed-size batches, columnar-ready.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class DecodedMedia(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float]
  )

  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia]
  }

  /** Deterministic fake decode over byte statistics (matches the `mm_meta`
    * oracle semantics): dims/frames derived from payload length, an 8-dim
    * "feature" vector from byte histogram moments. */
  object FakeDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia] = batch.map { r =>
      val n = r.payload.length.toLong
      val feats = Array.tabulate(8) { i =>
        var s = 0L
        var k = i
        while (k < r.payload.length) { s += (r.payload(k) & 0xff); k += 8 }
        (s % 1000).toFloat / 1000f
      }
      DecodedMedia(r.doc_id, r.media_type, n,
        width = (64 + n % 64).toInt,
        height = (64 + (n * 7) % 64).toInt,
        n_frames = (1 + n % 24).toInt,
        features = feats)
    }
  }

  /** Decode bytes with ImageIO (JDK-shipped PNG/JPEG/GIF/BMP readers);
    * null when the reader can't handle them. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: Exception => null }

  /** 8-bin luminance histogram, normalized — the shared pixel-feature
    * vector for still images and extracted video frames. */
  private def lumaHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val hist = new Array[Long](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist(lum >> 5) += 1
        x += 1
      }
      y += 1
    }
    val total = img.getWidth.toLong * img.getHeight
    hist.map(c => c.toFloat / total)
  }

  /** REAL image decode via `javax.imageio` — ships inside the JDK
    * (PNG/JPEG/GIF/BMP readers, no external codec): true pixel dimensions
    * plus an 8-bin luminance histogram as the feature vector. Records the
    * reader cannot decode fall back to header-sniffed dimensions
    * ([[ImageHeaders.sniff]]) with an empty feature vector, so a corrupt
    * payload degrades to metadata instead of failing the partition. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia] = batch.map { r =>
      val img = readImage(r.payload)
      if (img != null) {
        DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
          width = img.getWidth, height = img.getHeight, n_frames = 1,
          features = lumaHistogram(img))
      } else {
        val (w, h) = ImageHeaders.sniff(r.payload).map(s => (s._2, s._3)).getOrElse((0, 0))
        DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
          width = w, height = h, n_frames = 0, features = Array.empty[Float])
      }
    }
  }

  /** REAL audio decode for PCM WAV — RIFF is a raw-sample container, so no
    * codec library is needed ([[AudioBytes]]): header meta plus per-segment
    * RMS energy as the feature vector. `DecodedMedia` field mapping for
    * audio: width = sample rate (Hz), height = channels, n_frames = sample
    * frames (saturated at Int.MaxValue). Non-WAV / non-PCM16 payloads
    * degrade to metadata-or-nothing instead of failing the partition,
    * mirroring the corrupt-image path. */
  object RiffAudioDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia] = batch.map { r =>
      AudioBytes.wavMeta(r.payload) match {
        case Some(m) =>
          DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            width = m.sampleRate, height = m.channels,
            n_frames = math.min(m.nFrames, Int.MaxValue.toLong).toInt,
            features = AudioBytes.pcm16Features(r.payload, m))
        case None =>
          DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            width = 0, height = 0, n_frames = 0, features = Array.empty[Float])
      }
    }
  }

  /** Video CONTAINER metadata decode — codec-free ([[VideoBytes]]: MP4 box
    * tree, AVI RIFF headers): dimensions, duration, declared frame count.
    * `DecodedMedia` mapping: n_frames = declared frames (AVI; 0 for MP4,
    * whose frame count lives in per-track tables), features empty (no
    * pixel data without a codec). Unknown containers degrade to
    * metadata-or-nothing like the corrupt-image path. */
  object ContainerVideoDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia] = batch.map { r =>
      VideoBytes.sniff(r.payload) match {
        case Some(m) =>
          DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            width = m.width, height = m.height,
            n_frames = math.min(m.nFrames, Int.MaxValue.toLong).toInt,
            features = Array.empty[Float])
        case None =>
          DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            width = 0, height = 0, n_frames = 0, features = Array.empty[Float])
      }
    }
  }

  /** VIDEO frame/pixel decode, codec-free where the format allows it:
    * MJPEG-in-AVI frames are standalone JPEGs, so
    * [[VideoBytes.aviFirstJpegFrame]] + the JDK's ImageIO decode REAL
    * first-frame pixels — true dimensions plus the same 8-bin luminance
    * histogram the still-image path emits — with n_frames taken from the
    * container's `avih` header. Inter-frame codecs (H.264/VP9-class,
    * whose decoders are absent from this container) and non-AVI payloads
    * degrade to container metadata like [[ContainerVideoDecoder]], never
    * failing the partition. Every modality now has a real decode leg:
    * images ([[ImageIoDecoder]]), PCM-WAV audio ([[RiffAudioDecoder]]),
    * MJPEG video frames (here). */
  object CodecDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia] = batch.map { r =>
      val meta = VideoBytes.sniff(r.payload)
      val frame = VideoBytes.aviFirstJpegFrame(r.payload)
        .map(readImage).filter(_ != null)
      frame match {
        case Some(img) =>
          DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
            width = img.getWidth, height = img.getHeight,
            n_frames = meta.map(m => math.min(m.nFrames, Int.MaxValue.toLong).toInt)
              .filter(_ > 0).getOrElse(1),
            features = lumaHistogram(img))
        case None =>
          meta match {
            case Some(m) =>
              DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
                width = m.width, height = m.height,
                n_frames = math.min(m.nFrames, Int.MaxValue.toLong).toInt,
                features = Array.empty[Float])
            case None =>
              DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
                width = 0, height = 0, n_frames = 0, features = Array.empty[Float])
          }
      }
    }
  }

  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      format: String, width: Int, height: Int)

  /** Codec-free metadata pass over ALL payloads: container-header sniffing
    * only (~100 byte reads/record, no decode). At 100 TB this is the cheap
    * pre-filter that runs before any decode — drop sub-resolution images,
    * route by container format, size partitions — so the expensive decode
    * stage only ever sees records that survive it. */
  def sniffMeta(spark: SparkSession, ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import spark.implicits._
    ds.map { r =>
      // audio sniff reuses the (format, a, b) triple: a = sample rate,
      // b = channels — the routing facts a media pipeline buckets on
      val (fmt, w, h) = ImageHeaders.sniff(r.payload)
        .orElse(AudioBytes.wavMeta(r.payload).map(m => ("wav", m.sampleRate, m.channels)))
        .orElse(VideoBytes.sniff(r.payload).map(m => (m.format, m.width, m.height)))
        .getOrElse(("unknown", 0, 0))
      MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong, fmt, w, h)
    }
  }

  /** Documents table -> media records: text bytes stand in for the opaque
    * payload; media_type assigned round-robin like the mm_meta query. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      encode(col("text"), "UTF-8").as("payload")
    ).as[MediaRecord]
  }

  /** Re-partition so each partition holds ~`targetBytes` of payload —
    * media rows are size-skewed; row-count partitioning under-fills some
    * executors and OOMs others. */
  def repartitionByBytes(spark: SparkSession, ds: Dataset[MediaRecord], targetBytes: Long): Dataset[MediaRecord] = {
    val total = ds.toDF().agg(sum(length(col("payload")))).head.getLong(0)
    val parts = math.max(1, math.min(100000, total / math.max(1L, targetBytes))).toInt
    ds.repartition(parts)
  }

  /** Resize decoded media to target dims (fake arithmetic transform — the
    * real pixel work lives behind the decoder seam; the schema and scale
    * factors are what downstream consumers depend on). */
  def resize(spark: SparkSession, ds: Dataset[DecodedMedia], w: Int, h: Int): Dataset[DecodedMedia] = {
    import spark.implicits._
    ds.map(m => m.copy(width = w, height = h,
      features = m.features.map(f => f * (w.toFloat * h / (m.width.toFloat * m.height)))))
  }

  /** Frame sampling: evenly spaced frame indices (video path of the fake
    * decode; mirrors the mm_meta query's 0/mid/last picks when n=3). */
  def sampleFrames(nFrames: Int, n: Int): Seq[Int] =
    if (nFrames <= 0 || n <= 0) Nil
    else (0 until n).map(i => (i.toLong * (nFrames - 1) / math.max(1, n - 1)).toInt).distinct

  /** Partition-local batched decode — the real plumbing around the stubbed
    * codec: fixed-size batches through the injectable decoder. */
  def decodeAll(spark: SparkSession, ds: Dataset[MediaRecord], decoder: MediaDecoder,
                batchSize: Int = 64): Dataset[DecodedMedia] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decoder.decode(b.toSeq))
    }
  }
}
