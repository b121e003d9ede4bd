package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.{ChangeFeed, Snapshots}

/** The `spark.read` front door to snapshot tables: versionAsOf time
  * travel, CDC replay via changesFrom/changesTo, and filter/projection
  * delegation that reaches the underlying parquet scan. */
class SnapshotSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.SnapshotSource"

  private def freshLog(): String = {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    Snapshots.mergeCow(spark, root,
      Seq((7L, 700.0), (200L, 200.0)).toDF("k", "v"), Seq("k"), changeFeed = true)
    root
  }

  test("versionAsOf reads the exact historical version; default is latest") {
    val root = freshLog()
    val v0 = spark.read.format(fmt).option("versionAsOf", 0).load(root)
    assert(v0.count() == 100)
    assert(v0.where(col("k") === 7).select("v").as[Double].head() == 7.0)
    val latest = spark.read.format(fmt).load(root)
    assert(latest.count() == 101)
    assert(latest.where(col("k") === 7).select("v").as[Double].head() == 700.0)
  }

  test("changesFrom/changesTo replays the published change feed") {
    val root = freshLog()
    val feed = spark.read.format(fmt)
      .option("changesFrom", 0).option("changesTo", 1).load(root)
    assert(feed.select("k", ChangeFeed.opCol).as[(Long, String)].collect().toSet
      == Set((7L, "update_preimage"), (7L, "update_postimage"), (200L, "insert")))
    // half-set options fail loudly
    intercept[Exception](
      spark.read.format(fmt).option("changesFrom", 0).load(root).collect())
  }

  test("filters and projections survive the source boundary") {
    val root = freshLog()
    val got = spark.read.format(fmt).option("versionAsOf", 0).load(root)
      .where(col("k").between(10, 19)).select("k")
      .as[Long].collect().toSet
    assert(got == (10L to 19L).toSet)
    // a filter the source cannot translate is still applied (by Spark)
    val odd = spark.read.format(fmt).option("versionAsOf", 0).load(root)
      .where(col("k") % 2 === 1).count()
    assert(odd == 50)
  }
}
