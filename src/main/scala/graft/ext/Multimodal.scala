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

  /** Real-codec decode — requires image/audio libraries absent from this
    * container; deliberately unimplemented. */
  object CodecDecoder extends MediaDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[DecodedMedia] = ???
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
