package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Typed stats envelopes (integral + DOUBLE + STRING) riding the
  * snapshot log: the write-time `#stats:` codec must round-trip every
  * family exactly, planning must read ZERO parquet footers, and DML
  * victim selection must prune on double and string predicates. */
class StatsFamiliesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("#stats: codec round-trips all three families through the log") {
    val root = Files.createTempDirectory("sfam").toFile.getAbsolutePath + "/t"
    val df = (0 until 1200).map { i =>
      (i.toLong, i * 0.5, s"k${"%04d".format(i)}" + "y" * 20)
    }.toDF("id", "v", "s")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
    Snapshots.init(spark, root, df)
    assert(Snapshots.statsMissingFromLog(spark, root).isEmpty,
      "every file's stats must ride the delta — planning reads no footers")
    val fromLog = Snapshots.statsIndex(spark, root)
    val fromFooters = graft.core.Skipping.buildIndexForFiles(
      spark, fromLog.map(_.path))
    fromLog.sortBy(_.path).zip(fromFooters.sortBy(_.path)).foreach { case (a, b) =>
      assert(a.mins == b.mins && a.maxs == b.maxs, s"long family drifted: ${a.path}")
      assert(a.dmins == b.dmins && a.dmaxs == b.dmaxs, s"double family drifted: ${a.path}")
      assert(a.smins.keySet == b.smins.keySet && a.smaxs.keySet == b.smaxs.keySet)
      a.smins.keys.foreach(k => assert(a.smins(k).toSeq == b.smins(k).toSeq))
      a.smaxs.keys.foreach(k => assert(a.smaxs(k).toSeq == b.smaxs(k).toSeq))
    }
  }

  test("DML victim selection prunes on DOUBLE and STRING predicates") {
    val root = Files.createTempDirectory("sfam2").toFile.getAbsolutePath + "/t"
    val df = (0 until 1200).map { i =>
      (i.toLong, i * 0.5, ('a' + i / 400).toChar.toString + f"$i%04d")
    }.toDF("id", "v", "s")
      .repartitionByRange(3, col("v")).sortWithinPartitions("v")
    Snapshots.init(spark, root, df) // 3 files: v ∈ [0,~200), [~200,~400), [~400,600)
    val dblCands = Snapshots.statsCandidateFiles(spark, root, 0, "v >= 450.25 AND v <= 500.5")
    assert(dblCands.size == 1, s"double band should hit one clustered file: $dblCands")
    // interior band: repartitionByRange boundaries are SAMPLED, so a
    // file boundary may sit a few rows off the exact i=800 prefix flip —
    // an interior band is immune to the slop
    val strCands = Snapshots.statsCandidateFiles(spark, root, 0, "s >= 'c0900' AND s < 'c1100'")
    assert(strCands.size == 1, s"string band should hit one clustered file: $strCands")
    val none = Snapshots.statsCandidateFiles(spark, root, 0, "v > 1000.0")
    assert(none.isEmpty, "a band beyond every envelope selects zero candidate files")
    // and the rewrite itself is file-grain: delete in the double band
    val before = Snapshots.versionFiles(spark, root).toSet
    Snapshots.deleteWhere(spark, root, "v >= 450.25 AND v <= 500.5")
    val after = Snapshots.versionFiles(spark, root).toSet
    assert(before.intersect(after).size == 2,
      "the two files outside the double band carry by reference")
    assert(Snapshots.readVersion(spark, root)
      .where(col("v") >= 450.25 && col("v") <= 500.5).isEmpty)
  }
}
