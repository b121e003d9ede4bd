package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental-sync contract: each sync reads only the source files
  * appended past the destination's #txn watermark, exactly-once across
  * replays, with rewrite commits refused (or skipped on request) —
  * never silently double-counted. */
class TableSyncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("sync").toFile.getAbsolutePath

  test("incremental sync: O(change) reads, content parity, exactly-once replay") {
    val base = tmp()
    val src = s"$base/src"; val dst = s"$base/dst"
    Snapshots.init(spark, src, (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.append(spark, src, (51L to 80L).map(i => (i, i * 1.0)).toDF("k", "v"))
    val double = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("v2", col("v") * 2)

    val r1 = TableSync.syncIncremental(spark, src, dst, double)
    assert(r1.committed && r1.srcVersion == 1 && r1.versionsConsumed == 2)
    assert(Snapshots.readVersion(spark, dst).count() == 80)

    // a new append syncs alone: exactly that version's files are read
    Snapshots.append(spark, src, (81L to 90L).map(i => (i, i * 1.0)).toDF("k", "v"))
    val v2Adds = Snapshots.readDelta(spark, src, 2).adds.size
    val r2 = TableSync.syncIncremental(spark, src, dst, double)
    assert(r2.committed && r2.versionsConsumed == 1 && r2.filesRead == v2Adds)

    // destination == transform of the source head, exactly
    val want = double(Snapshots.readVersion(spark, src))
    val got = Snapshots.readVersion(spark, dst)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // replay (crash after commit, before any external bookkeeping): no-op
    val r3 = TableSync.syncIncremental(spark, src, dst, double)
    assert(!r3.committed && r3.versionsConsumed == 0)
    assert(Snapshots.latestVersion(spark, dst) == 1)
  }

  test("rewrite commits refuse appends-only tailing; skipRewrites skips them whole") {
    val base = tmp()
    val src = s"$base/src"; val dst = s"$base/dst"
    Snapshots.init(spark, src, (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"))
    TableSync.syncIncremental(spark, src, dst)
    Snapshots.deleteKeysCow(spark, src, Seq(7L).toDF("k"), Seq("k"))
    val ex = intercept[IllegalStateException](
      TableSync.syncIncremental(spark, src, dst))
    assert(ex.getMessage.contains("rewrite"))
    // skipped wholesale: watermark advances, no double-counted carried rows
    val r = TableSync.syncIncremental(spark, src, dst, skipRewrites = true)
    assert(r.srcVersion == 1 && r.filesRead == 0)
    assert(Snapshots.readVersion(spark, dst).count() == 50,
      "a skipped rewrite must contribute no rows (insert-only contract)")
    // tailing resumes cleanly past the skipped rewrite
    Snapshots.append(spark, src, Seq((100L, 1.0)).toDF("k", "v"))
    val r2 = TableSync.syncIncremental(spark, src, dst, skipRewrites = true)
    assert(r2.committed && r2.versionsConsumed == 1)
    assert(Snapshots.readVersion(spark, dst).count() == 51)
  }

  test("OPTIMIZE commits are auto-skipped: same rows, no skipRewrites needed") {
    val base = tmp()
    val src = s"$base/src"; val dst = s"$base/dst"
    Snapshots.init(spark, src, (1L to 40L).map(i => (i, i * 1.0)).toDF("k", "v"))
    TableSync.syncIncremental(spark, src, dst)
    Snapshots.optimizeCow(spark, src, Seq("k"), numFiles = 2)
    Snapshots.append(spark, src, Seq((41L, 41.0)).toDF("k", "v"))
    // no flag: the compaction contributes nothing, the append flows
    val r = TableSync.syncIncremental(spark, src, dst)
    assert(r.committed && r.versionsConsumed == 2)
    assert(Snapshots.readVersion(spark, dst).count() == 41,
      "compaction must not double-count rewritten rows downstream")
  }
}
