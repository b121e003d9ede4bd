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
}
