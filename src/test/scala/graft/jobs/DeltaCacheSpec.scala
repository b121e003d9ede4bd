package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata caches keyed by (root, version) must survive two hazards:
  *
  *   1. STALENESS: a table DELETED and RE-CREATED at the same path
  *      restarts its log at version 0 — the same cache key now names
  *      different content (different file UUIDs, different stats). A
  *      long-lived session (the bench's second run, any notebook) must
  *      see the fresh table, not the tombstone of the old one.
  *   2. RE-READS: planning the same immutable version twice must not
  *      re-read the log from the filesystem (VERDICT r10 #3 — the
  *      optimizer's fixed-point batch plans each query at least twice,
  *      and object-store metadata latency per optimizer iteration is
  *      the cost the cache exists to remove).
  */
class DeltaCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(root: String, binOffset: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val df = (0 until 400).map(i => (i.toLong, (i % 4 + binOffset).toLong))
      .toDF("id", "bin").repartition(2)
    Snapshots.init(spark, root, df)
    Snapshots.append(spark, root,
      (400 until 800).map(i => (i.toLong, (i % 4 + binOffset).toLong))
        .toDF("id", "bin").repartition(2))
  }

  test("statsIndex is invalidated when a table is re-created at the same path") {
    val root = Files.createTempDirectory("dcache").toFile.getAbsolutePath + "/t"
    freshTable(root, binOffset = 0) // bins 0..3
    val idx1 = Snapshots.statsIndex(spark, root)
    assert(idx1.nonEmpty)
    // warm the scan path too (SnapshotFileIndex + survivingPaths)
    val n1 = spark.read.format("graft.sources.SnapshotSource").load(root)
      .where(col("bin") === 2L).count()
    assert(n1 == 200L)

    freshTable(root, binOffset = 10) // same path, same versions, bins 10..13
    val idx2 = Snapshots.statsIndex(spark, root)
    // the old files are gone; a stale index would still name them
    assert(idx2.map(_.path).toSet.intersect(idx1.map(_.path).toSet).isEmpty,
      "statsIndex served file stats from the DELETED incarnation of the table")
    val n2 = spark.read.format("graft.sources.SnapshotSource").load(root)
      .where(col("bin") === 12L).count()
    assert(n2 == 200L, "stale stats pruned the fresh table's files")
    // and the old predicate now provably matches nothing
    val n0 = spark.read.format("graft.sources.SnapshotSource").load(root)
      .where(col("bin") === 2L).count()
    assert(n0 == 0L)
  }

  test("planning the same immutable version twice reads the log zero more times") {
    val root = Files.createTempDirectory("dcache2").toFile.getAbsolutePath + "/t"
    freshTable(root, binOffset = 0)
    val df = spark.read.format("graft.sources.SnapshotSource").load(root)
      .where(col("bin") === 1L)
    df.count() // warm: delta headers + stats index enter the cache
    val before = Snapshots.deltaFileReads.get()
    df.count()
    spark.read.format("graft.sources.SnapshotSource").load(root)
      .where(col("bin") === 3L).count()
    val after = Snapshots.deltaFileReads.get()
    assert(after == before,
      s"replanning a cached version re-read the log ${after - before} times")
  }
}
