package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.ChangeFeed

/** The streaming-CDC contract: the per-batch change feeds a streaming
  * merge publishes, replayed in batch order onto the initial snapshot,
  * reconstruct the final table exactly — including a partition move. */
class ChangeFeedReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[(String, Double, String)] =
    df.select("k", "v", "p").as[(String, Double, String)].collect().toSet

  test("concatenated per-batch feeds replay to the final merged state") {
    val fact = Files.createTempDirectory("cdc-fact").toFile.getAbsolutePath
    val feed = Files.createTempDirectory("cdc-feed").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("cdc-stage").toFile.getAbsolutePath
    val updates = Files.createTempDirectory("cdc-upd").toFile.getAbsolutePath
    val checkpoint = Files.createTempDirectory("cdc-ckpt").toFile.getAbsolutePath

    val initial = Seq(("k1", 10.0, "p0"), ("k2", 20.0, "p0"),
      ("k3", 30.0, "p1"), ("k5", 50.0, "p2"))
    initial.toDF("k", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(fact)
    val snapshot = initial.toDF("k", "v", "p")

    // batch 0: update k1 + insert k9; batch 1: move k5 p2 -> p0
    Seq(("k1", 11.0, "p0"), ("k9", 90.0, "p1")).toDF("k", "v", "p")
      .coalesce(1).write.mode("append").parquet(updates)
    Seq(("k5", 55.0, "p0")).toDF("k", "v", "p")
      .coalesce(1).write.mode("append").parquet(updates)

    StreamingJobs.streamingMergeWithChangeFeed(spark, updates, fact, feed,
      staging, checkpoint, Seq("k"), "p")

    val finalFact = rows(spark.read.parquet(fact))
    assert(finalFact == Set(("k1", 11.0, "p0"), ("k2", 20.0, "p0"),
      ("k9", 90.0, "p1"), ("k3", 30.0, "p1"), ("k5", 55.0, "p0")))

    // replay: fold the feeds over the initial snapshot in batch order
    val batchDirs = new java.io.File(feed).listFiles()
      .filter(_.getName.startsWith("batch=")).sortBy(_.getName)
    assert(batchDirs.length == 2, "one feed directory per micro-batch")
    val replayed = batchDirs.foldLeft(snapshot) { (snap, dir) =>
      ChangeFeed.applyChangeFeed(snap, spark.read.parquet(dir.getAbsolutePath), Seq("k"))
    }
    assert(rows(replayed) == finalFact,
      "feed replay must reconstruct the post-merge table")

    // feeds carry real pre-images: batch 1's pre-image is k5's OLD row
    val b1 = spark.read.parquet(batchDirs(1).getAbsolutePath)
    assert(rows(b1.where(b1(ChangeFeed.opCol) === "update_preimage"))
      == Set(("k5", 50.0, "p2")))
  }
}
