package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The CDC invariant: replaying the change feed onto the pre-merge
  * snapshot must yield exactly the post-merge table — for both the MERGE
  * feed and the DELETE feed, including partition-moving updates. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[(String, Long, Double, String)] =
    df.select("k", "seq", "v", "p").as[(String, Long, Double, String)].collect().toSet

  private val targetRows = Seq(
    ("k1", 1L, 10.0, "p0"), ("k2", 2L, 20.0, "p0"),
    ("k3", 3L, 30.0, "p1"), ("k4", 4L, 40.0, "p1"),
    ("k5", 5L, 50.0, "p2"))

  test("merge feed replay == actual merge result (incl. a partition move)") {
    val root = Files.createTempDirectory("cdc").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("cdc-stage").toFile.getAbsolutePath
    val target = targetRows.toDF("k", "seq", "v", "p")
    target.write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)

    // update k1 in place, move k5 p2->p0, insert k9
    val src = Seq(("k1", 100L, 11.0, "p0"), ("k5", 55L, 51.0, "p0"),
        ("k9", 9L, 90.0, "p1"))
      .toDF("k", "seq", "v", "p")

    val feed = ChangeFeed.mergeFeed(target, src, Seq("k"))
    val ops = feed.groupBy(col(ChangeFeed.opCol)).count()
      .as[(String, Long)].collect().toMap
    assert(ops == Map("insert" -> 1L, "update_postimage" -> 2L, "update_preimage" -> 2L))
    // pre-images carry the OLD row, post-images the NEW one
    assert(rows(feed.where(col(ChangeFeed.opCol) === "update_preimage"))
      == Set(("k1", 1L, 10.0, "p0"), ("k5", 5L, 50.0, "p2")))
    assert(rows(feed.where(col(ChangeFeed.opCol) === "update_postimage"))
      == Set(("k1", 100L, 11.0, "p0"), ("k5", 55L, 51.0, "p0")))

    val merged = Merge.mergeIntoPartitioned(spark, root, src, Seq("k"), "p", staging)
    val replayed = ChangeFeed.applyChangeFeed(target, feed, Seq("k"))
    assert(rows(replayed) == rows(merged),
      "snapshot + feed must equal the post-merge table")
  }

  test("delete feed replay == actual deleteKeys result") {
    val root = Files.createTempDirectory("cdc-del").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("cdc-del-stage").toFile.getAbsolutePath
    val target = targetRows.toDF("k", "seq", "v", "p")
    target.write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)

    val keys = Seq("k2", "k5").toDF("k")
    val feed = ChangeFeed.deleteFeed(target, keys, Seq("k"))
    assert(rows(feed) == Set(("k2", 2L, 20.0, "p0"), ("k5", 5L, 50.0, "p2")))

    val (after, _) = Lifecycle.deleteKeys(spark, root, keys, Seq("k"), Seq("p"), staging)
    val replayed = ChangeFeed.applyChangeFeed(target, feed, Seq("k"))
    assert(rows(replayed) == rows(after))
  }

  test("duplicate source keys collapse before the feed (same as Merge)") {
    val target = targetRows.toDF("k", "seq", "v", "p")
    val src = Seq(("k9", 9L, 90.0, "p0"), ("k9", 99L, 91.0, "p0")).toDF("k", "seq", "v", "p")
    val feed = ChangeFeed.mergeFeed(target, src, Seq("k"))
    assert(feed.where(col(ChangeFeed.opCol) === "insert").count() == 1)
  }

  test("table_changes carries _commit_timestamp from the in-commit #ts: header") {
    val root = Files.createTempDirectory("cdcts").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    Snapshots.append(spark, root, Seq((3L, 3.0)).toDF("k", "v"))
    Snapshots.deleteWhere(spark, root, "k = 1", changeFeed = true)
    val tc = graft.sources.GraftTableChanges.changes(spark, root, 1L, 2L)
    assert(tc.schema.fieldNames.contains("_commit_timestamp"))
    assert(tc.schema("_commit_timestamp").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // each row's timestamp is EXACTLY its commit's in-commit #ts: header
    val got = tc.select(col("_commit_version"),
        unix_millis(col("_commit_timestamp")).as("ms"))
      .distinct().as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L), got.toString)
    (1L to 2L).foreach { v =>
      assert(got(v) == Snapshots.commitTimestamp(spark, root, v),
        s"v$v timestamp must be the in-commit header, got $got")
    }
    // strictly increasing across versions (the #ts: floor discipline)
    assert(got(1L) < got(2L), "in-commit timestamps strictly increase")

    // timestampAsOf resolution is IMMUNE to log-file mtime skew: touch
    // v1's delta file far into the future; resolution still follows the
    // in-commit header, not the disturbed mtime
    val tsOfV1 = Snapshots.commitTimestamp(spark, root, 1L)
    val logFile = new java.io.File(root, f"_log/v${1L}%08d.commit")
    assert(logFile.exists)
    assert(logFile.setLastModified(System.currentTimeMillis + 86400000L))
    Snapshots.invalidateCaches(spark, root)
    assert(Snapshots.versionAt(spark, root, tsOfV1) == 1L,
      "timestampAsOf must resolve from in-commit timestamps, not mtime")
    assert(Snapshots.commitTimestamp(spark, root, 1L) == tsOfV1,
      "commitTimestamp unchanged by a disturbed file mtime")
  }
}
