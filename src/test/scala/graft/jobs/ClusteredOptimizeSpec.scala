package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Clustered-table OPTIMIZE (`optimizeClustered`): plain OPTIMIZE on a
  * `graft.clusterBy` table re-clusters by the declared columns, and is
  * an incremental metadata-only no-op once the layout is tight. */
class ClusteredOptimizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("copt").toFile.getAbsolutePath + "/t"

  test("overlapping appends recluster; a tight layout no-ops; content preserved") {
    val root = tmp()
    // two commits with fully interleaved key ranges: every file's
    // envelope spans the whole domain — skipping can prune nothing
    Snapshots.init(spark, root,
      (1L to 400L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(3),
      Map("graft.clusterBy" -> "k"))
    Snapshots.append(spark, root,
      (401L to 800L).filter(_ % 2 == 0).map(i => (i, i * 1.0)).toDF("k", "v")
        .unionAll((401L to 800L).filter(_ % 2 == 1).map(i => (i, i * 1.0)).toDF("k", "v"))
        .repartition(3))
    val v = spark.sql(s"OPTIMIZE graft.`$root`").as[Long].head()
    assert(v == 2L, "overlapping envelopes admit a recluster")
    assert(Snapshots.readVersion(spark, root).count() == 800, "content preserved")
    // tight now: the same statement commits NOTHING (pure metadata pass)
    assert(spark.sql(s"OPTIMIZE graft.`$root`").as[Long].head() == -1L)
    assert(Snapshots.latestVersion(spark, root) == 2L)
    // skipping works after the recluster: an interior band plans fewer
    // files than the table holds (boundaries are sampled — band, not
    // exact file counts)
    val files = Snapshots.versionFiles(spark, root)
    if (files.size > 1) {
      val cands = Snapshots.statsCandidateFiles(spark, root,
        Snapshots.latestVersion(spark, root), "k >= 390 AND k <= 410")
      assert(cands.nonEmpty && cands.size < files.size)
    }
  }

  test("disjoint small appends trigger the fragmentation bound, then settle") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map("graft.clusterBy" -> "k"))
    // strictly increasing, non-overlapping appends: overlap-admission
    // alone would never fire, but 6 files > 4x the 1-file target packing
    (1 to 5).foreach { b =>
      Snapshots.append(spark, root,
        (b * 100L + 1 to b * 100L + 100).map(i => (i, i * 1.0)).toDF("k", "v"))
    }
    assert(Snapshots.versionFiles(spark, root).size >= 6)
    val v = Snapshots.optimizeClustered(spark, root)
    assert(v > 0, "fragmentation admits a rewrite even with disjoint ranges")
    assert(Snapshots.optimizeClustered(spark, root) == -1L, "then settles")
    assert(Snapshots.readVersion(spark, root).count() == 600)
  }

  test("an unclustered table keeps bin-pack semantics under plain OPTIMIZE") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(5))
    assert(spark.sql(s"OPTIMIZE graft.`$root`").as[Long].head() == 1L)
    assert(Snapshots.versionFiles(spark, root).size == 1)
    intercept[IllegalArgumentException](Snapshots.optimizeClustered(spark, root))
  }
}
