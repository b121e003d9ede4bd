package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The foreachBatch key-merge sink dedupes across reruns and overlapping
  * source files — the effectively-exactly-once contract. */
class ForeachBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("key merge: rerun is a no-op, overlapping new data dedupes on the key") {
    val src = Files.createTempDirectory("fb-src").toFile.getAbsolutePath
    val out = Files.createTempDirectory("fb-out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("fb-ckpt").toFile.getAbsolutePath

    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("event_id", "payload")
      .write.mode("append").parquet(src)
    StreamingJobs.foreachBatchKeyMerge(spark, src, out, ckpt, "event_id")
    assert(spark.read.parquet(out).count() == 3)

    // same checkpoint, no new files: nothing appended
    StreamingJobs.foreachBatchKeyMerge(spark, src, out, ckpt, "event_id")
    assert(spark.read.parquet(out).count() == 3)

    // new file replays keys 2,3 and adds 4: only 4 lands
    Seq((2L, "b2"), (3L, "c2"), (4L, "d")).toDF("event_id", "payload")
      .write.mode("append").parquet(src)
    StreamingJobs.foreachBatchKeyMerge(spark, src, out, ckpt, "event_id")
    val got = spark.read.parquet(out)
    assert(got.count() == 4)
    assert(got.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // key 2 kept its FIRST payload (replays did not overwrite)
    assert(got.where($"event_id" === 2L).select("payload").as[String].head() == "b")
  }
}
