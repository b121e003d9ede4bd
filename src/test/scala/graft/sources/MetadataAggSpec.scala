package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** Metadata-only aggregates (MetadataAggRule): unfiltered global
  * COUNT/MIN/MAX over a snapshot relation answers from the log's stats
  * envelopes with ZERO data files planned — and every unanswerable
  * shape (filters, deletion vectors, NaN-poisoned envelopes, truncated
  * string bounds) falls back to the scan with identical results. */
class MetadataAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("magg").toFile.getAbsolutePath + "/t"

  private def scansOf(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
      case _: org.apache.spark.sql.execution.FileSourceScanExec => 1
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(qs.plan)
    }.sum
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
      case p => walk(p)
    }
  }

  private def front(root: String) =
    spark.read.format("graft.sources.SnapshotSource").load(root)

  test("COUNT/MIN/MAX answer from the log with zero file scans; values exact") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 500L).map(i => (i, i * 0.5, s"s$i")).toDF("k", "v", "s").repartition(3))
    Snapshots.append(spark, root,
      (501L to 600L).map(i => (i, null.asInstanceOf[java.lang.Double], s"s$i"))
        .toDF("k", "v", "s").repartition(2))
    val agg = front(root).agg(
      count(lit(1)).as("n"), count(col("v")).as("nv"),
      min(col("k")).as("mnk"), max(col("k")).as("mxk"),
      min(col("v")).as("mnv"), max(col("v")).as("mxv"))
    val row = agg.head()
    assert(scansOf(agg) == 0, "the aggregate must be answered WITHOUT scanning")
    assert(row.getLong(0) == 600L && row.getLong(1) == 500L)
    assert(row.getLong(2) == 1L && row.getLong(3) == 600L)
    assert(row.getDouble(4) == 0.5 && row.getDouble(5) == 250.0)
    // an all-null column aggregates to count 0 / null bounds
    val root2 = tmp()
    Snapshots.init(spark, root2,
      (1L to 9L).map(i => (i, null.asInstanceOf[java.lang.Double])).toDF("k", "v"))
    val agg2 = front(root2).agg(count(col("v")).as("nv"),
      min(col("v")).as("mnv"))
    val r2 = agg2.head()
    assert(scansOf(agg2) == 0)
    assert(r2.getLong(0) == 0L && r2.isNullAt(1))
  }

  test("parquet-checkpoint tables answer from ONE distributed summary pass") {
    // same answers as the driver-index path, but the envelope facts
    // come from a distributed aggregate over the checkpoint rows — at
    // 10⁶ files the driver never materializes the stats index for a
    // metadata-only COUNT/MIN/MAX
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 300L).map(i => (i, i * 0.5, s"s$i")).toDF("k", "v", "s").repartition(2),
      Map(Snapshots.checkpointFormatProp -> "parquet"))
    (1 to 10).foreach(b => Snapshots.append(spark, root,
      (1L to 10L).map(i => (1000L + b * 10L + i, null.asInstanceOf[java.lang.Double],
        "x")).toDF("k", "v", "s").coalesce(1)))
    val agg = front(root).agg(
      count(lit(1)).as("n"), count(col("v")).as("nv"),
      min(col("k")).as("mnk"), max(col("k")).as("mxk"),
      min(col("v")).as("mnv"), max(col("v")).as("mxv"))
    val row = agg.head()
    assert(scansOf(agg) == 0,
      "the aggregate must be answered WITHOUT scanning data files")
    assert(row.getLong(0) == 400L && row.getLong(1) == 300L)
    assert(row.getLong(2) == 1L && row.getLong(3) == 1110L)
    assert(row.getDouble(4) == 0.5 && row.getDouble(5) == 150.0)
    // a filtered aggregate still falls back to the scan, same answers
    val filtered = front(root).where(col("k") <= 100)
      .agg(count(lit(1)).as("n"))
    assert(filtered.head().getLong(0) == 100L)
    assert(scansOf(filtered) > 0)
  }

  test("filters, string bounds, DVs and NaN all fall back to the scan — same answers") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 300L).map(i => (i, i * 1.0, s"s$i")).toDF("k", "v", "s").repartition(2))
    // a filter disqualifies (it changes every aggregate)
    val filtered = front(root).where(col("k") > 100L).agg(max(col("k")).as("m"))
    assert(scansOf(filtered) > 0)
    assert(filtered.head().getLong(0) == 300L)
    // string MIN/MAX never answers from (truncated) envelopes
    val strAgg = front(root).agg(min(col("s")).as("m"))
    assert(scansOf(strAgg) > 0)
    assert(strAgg.head().getString(0) == "s1")
    // NaN: the poisoned file has no double envelope — MAX must scan
    // (Spark orders NaN above every value; an envelope answer would miss it)
    Snapshots.append(spark, root,
      Seq((1000L, Double.NaN, "x")).toDF("k", "v", "s"))
    val nanAgg = front(root).agg(max(col("v")).as("m"))
    assert(scansOf(nanAgg) > 0)
    assert(nanAgg.head().getDouble(0).isNaN)
    // but COUNT(*) alone is still metadata-only (rows don't need envelopes)
    val cnt = front(root).agg(count(lit(1)).as("n"))
    assert(scansOf(cnt) == 0 && cnt.head().getLong(0) == 301L)
    // deletion vectors: envelope rows over-count — everything scans
    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    val dvCnt = front(root).agg(count(lit(1)).as("n"))
    assert(scansOf(dvCnt) > 0 && dvCnt.head().getLong(0) == 291L)
  }
}
