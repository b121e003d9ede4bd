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

  test("CodecDecoder is a deliberate stub") {
    intercept[NotImplementedError] {
      Multimodal.CodecDecoder.decode(Seq.empty)
    }
  }
}
