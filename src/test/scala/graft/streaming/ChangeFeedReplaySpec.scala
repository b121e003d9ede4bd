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

  test("a crash-replayed batch does not corrupt its already-committed feed") {
    val fact = Files.createTempDirectory("cdc2-fact").toFile.getAbsolutePath
    val feed = Files.createTempDirectory("cdc2-feed").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("cdc2-stage").toFile.getAbsolutePath

    Seq(("k1", 10.0, "p0"), ("k2", 20.0, "p0")).toDF("k", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(fact)
    val batch = Seq(("k1", 11.0, "p0"), ("k9", 90.0, "p1")).toDF("k", "v", "p")

    // first delivery: feed computed against the pre-merge target
    assert(StreamingJobs.mergeWithFeedBatch(spark, batch, 0L, fact, feed,
      staging, Seq("k"), "p"))
    val feedAfterFirst = spark.read.parquet(s"$feed/batch=0")
    val firstOps = feedAfterFirst.select("k", ChangeFeed.opCol)
      .as[(String, String)].collect().toSet
    assert(firstOps == Set(("k1", "update_preimage"), ("k1", "update_postimage"),
      ("k9", "insert")))
    val preImage = rows(feedAfterFirst
      .where(feedAfterFirst(ChangeFeed.opCol) === "update_preimage"))

    // crash-replay: the merge already applied, checkpoint never advanced.
    // Without the _SUCCESS gate the recompute would read the POST-merge
    // target: k9 reclassified insert -> update, k1's pre-image = 11.0.
    assert(!StreamingJobs.mergeWithFeedBatch(spark, batch, 0L, fact, feed,
      staging, Seq("k"), "p"), "replay must skip the feed recompute")
    val feedAfterReplay = spark.read.parquet(s"$feed/batch=0")
    assert(feedAfterReplay.select("k", ChangeFeed.opCol)
      .as[(String, String)].collect().toSet == firstOps,
      "replay must not reclassify ops against the merged target")
    assert(rows(feedAfterReplay
      .where(feedAfterReplay(ChangeFeed.opCol) === "update_preimage")) == preImage
      && preImage == Set(("k1", 10.0, "p0")),
      "pre-images must keep pre-merge values across a replay")
    // and the re-applied merge is a no-op on the target
    assert(rows(spark.read.parquet(fact)) ==
      Set(("k1", 11.0, "p0"), ("k2", 20.0, "p0"), ("k9", 90.0, "p1")))
  }
}
