package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** Hidden partitioning (GeneratedPruningRule): a predicate on the
  * SOURCE column of a generated partition column prunes partitions —
  * the user never names the partition key. */
class GeneratedPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("genp").toFile.getAbsolutePath + "/t"

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q.plan.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      case _ => Nil
    }.map(_.metrics("numFiles").value).sum
  }

  test("ts-range predicate prunes date(ts)-partitioned files without naming the partition column") {
    val root = tmp()
    val rows = (0 until 72).map { h =>
      (h.toLong, Timestamp.valueOf(f"2026-01-${1 + h / 24}%02d ${h % 24}%02d:30:00"), h * 1.0)
    }
    Snapshots.init(spark, root, rows.toDF("k", "ts", "v"),
      Map("graft.partitionBy" -> "ev_day",
        "graft.generated.ev_day" -> "date(ts)"))
    val all = Snapshots.versionFiles(spark, root)
    val day2 = all.count(_.contains("ev_day=2026-01-02"))
    assert(day2 > 0 && day2 < all.size)
    def front = spark.read.format("graft.sources.SnapshotSource").load(root)

    // BETWEEN inside day 2 only — partition filter must derive from ts
    val q = front.where(col("ts").between("2026-01-02 00:00:00", "2026-01-02 23:59:59"))
      .select("k")
    assert(q.as[Long].collect().sorted.toSeq == (24L to 47L))
    assert(plannedFiles(q) == day2,
      s"a ts-only range must plan exactly day 2's $day2 file(s), " +
        s"planned ${plannedFiles(q)} of ${all.size}")

    // equality on ts derives equality on the generated day
    val qe = front.where(col("ts") === "2026-01-03 05:30:00").select("k")
    assert(qe.as[Long].collect().toSeq == Seq(53L))
    assert(plannedFiles(qe) == all.count(_.contains("ev_day=2026-01-03")))

    // IN-list on ts derives an IN-list on the generated day
    val qi = front.where(col("ts").isin("2026-01-01 02:30:00", "2026-01-03 05:30:00"))
      .select("k")
    assert(qi.as[Long].collect().sorted.toSeq == Seq(2L, 53L))
    assert(plannedFiles(qi) ==
      all.count(f => f.contains("ev_day=2026-01-01") || f.contains("ev_day=2026-01-03")),
      "two-point IN plans exactly the two matching days")
  }

  test("floor-div bucket generator prunes on the raw key; unsupported generators stay correct") {
    val root = tmp()
    Snapshots.init(spark, root,
      (0L until 300L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map("graft.partitionBy" -> "bucket",
        "graft.generated.bucket" -> "floor(k / 100)"))
    val all = Snapshots.versionFiles(spark, root)
    assert(all.exists(_.contains("bucket=1")))
    def front = spark.read.format("graft.sources.SnapshotSource").load(root)
    val q = front.where(col("k") >= 120 && col("k") < 180).select("k")
    assert(q.as[Long].collect().sorted.toSeq == (120L until 180L))
    assert(plannedFiles(q) == all.count(_.contains("bucket=1")),
      "k-range inside bucket 1 plans only bucket 1's files")

    // a non-monotone generator derives nothing but stays exact
    val root2 = tmp()
    val rows2 = (0 until 48).map { h =>
      (h.toLong, Timestamp.valueOf(f"2026-01-${1 + h / 24}%02d ${h % 24}%02d:00:00"))
    }
    Snapshots.init(spark, root2, rows2.toDF("k", "ts"),
      Map("graft.partitionBy" -> "ev_hour",
        "graft.generated.ev_hour" -> "hour(ts)"))
    val q2 = spark.read.format("graft.sources.SnapshotSource").load(root2)
      .where(col("ts") >= "2026-01-02 00:00:00").select("k")
    assert(q2.as[Long].collect().sorted.toSeq == (24L to 47L),
      "hour(ts) is not monotone — no RANGE derivation, exact rows regardless")
    // …but EQUALITY derives for any deterministic generator (Iceberg's
    // hour/month/day transforms): ts = T prunes to the hour(T) partition
    val all2 = Snapshots.versionFiles(spark, root2)
    val q3 = spark.read.format("graft.sources.SnapshotSource").load(root2)
      .where(col("ts") === Timestamp.valueOf("2026-01-02 05:00:00")).select("k")
    assert(q3.as[Long].collect().toSeq == Seq(29L))
    assert(plannedFiles(q3) == all2.count(_.contains("ev_hour=5")),
      "ts equality plans only the hour(ts)=5 partition's files")
    assert(all2.count(_.contains("ev_hour=5")) < all2.size)
  }
}
