package graft.jobs

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sidecar checkpoints (`graft.checkpoint.sidecars = true`): the
  * checkpoint becomes a thin manifest (headers + sidecar references +
  * tombstones + fresh rows) over immutable row files in
  * `_log/_sidecars/`, so a steady-state checkpoint writes O(change since
  * the last spill) instead of the O(table) full row set. Pins: exact
  * parity with from-v0 replay through a DML mix, the O(change) write
  * shape (manifest fresh-row bound, spills), distributed==driver prune
  * parity, tombstone correctness across remove/re-add (RESTORE), vacuum
  * reclaiming dead sidecars while reads stay exact, the reader-feature
  * gate, and DROP FEATURE refusing while references survive. */
class SidecarCheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("scckpt").toFile.getAbsolutePath + "/t"

  private val props = Map(
    Snapshots.checkpointFormatProp -> "parquet",
    Snapshots.checkpointSidecarsProp -> "true",
    // tiny spill bound so the tests exercise spills + multi-ref reads
    "graft.checkpoint.sidecar.spillRows" -> "20")

  private def logNames(root: String): Seq[String] = {
    val p = new Path(root + "/_log")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  private def sidecarNames(root: String): Seq[String] = {
    val p = new Path(root + "/_log/_sidecars")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  test("a DML mix on a sidecar table reconstructs EXACTLY the delta replay") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(2), props)
    (1 to 12).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 20L).map(i => (b * 1000L + i, i * 2.0)).toDF("k", "v").repartition(2))
    }                                                // v1..v12 (ckpt v10)
    Snapshots.deleteWhere(spark, root, "k <= 10")    // v13
    Snapshots.updateWhere(spark, root, Map("v" -> "v + 0.5"), "k > 11000") // v14
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30) // v15: wide remove+add
    val preRestore = Snapshots.latestVersion(spark, root)
    Snapshots.append(spark, root, Seq((777777L, 1.0)).toDF("k", "v")) // v16
    Snapshots.restore(spark, root, preRestore)       // v17: RE-ADDS removed paths
    (1 to 8).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 5L).map(i => (50000L + b * 100L + i, i * 3.0)).toDF("k", "v"))
    }                                                // → past the v20 ckpt
    val head = Snapshots.latestVersion(spark, root)
    assert(head >= 20L)
    assert(sidecarNames(root).nonEmpty, "spills must have landed sidecars")
    val viaCkpt = (0L to head).map(v => Snapshots.versionFiles(spark, root, v))
    val rows = Snapshots.readVersion(spark, root)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    // ground truth: from-v0 pure delta replay (checkpoints deleted)
    val p = new Path(root + "/_log")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    logNames(root).filter(_.endsWith(".checkpoint.parquet"))
      .foreach(n => fs.delete(new Path(p, n), true))
    Snapshots.invalidateCaches(spark, root)
    assert((0L to head).map(v => Snapshots.versionFiles(spark, root, v)) == viaCkpt,
      "sidecar-assembled reconstruction must equal from-v0 replay at EVERY version")
    assert(Snapshots.readVersion(spark, root)
      .orderBy("k").as[(Long, Double)].collect().toSeq == rows)
  }

  test("steady-state sidecar checkpoints write O(change): manifest stays thin") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((0L, 0.0)).toDF("k", "v"), props)
    // 30 single-file commits → checkpoints at v10/v20/v30, spills when
    // fresh exceeds 20 rows
    (1 to 30).foreach { b =>
      Snapshots.append(spark, root,
        Seq((b * 10L, b * 1.0)).toDF("k", "v").coalesce(1))
    }
    val (fs, _) = (new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration), ())
    def manifestFileRows(v: Long): Long =
      spark.read.parquet(f"$root/_log/v$v%08d.checkpoint.parquet")
        .filter(col("kind") === "file").count()
    // every manifest's FRESH row count is bounded by the spill threshold
    // + one checkpoint's change — never the full table
    Seq(10L, 20L, 30L).foreach { v =>
      assert(manifestFileRows(v) <= 20L + 10L,
        s"manifest at v$v must carry fresh rows only (O(change)), " +
          s"got ${manifestFileRows(v)} of ${v + 1} live files")
    }
    assert(sidecarNames(root).nonEmpty)
    // and the head manifest + sidecars assemble the exact live set
    val head = Snapshots.latestVersion(spark, root)
    assert(Snapshots.versionFiles(spark, root, head).size == 31)
    assert(Snapshots.readVersion(spark, root).count() == 31L)
  }

  test("distributed prune == driver prune on a sidecar table") {
    val root = tmp()
    Snapshots.init(spark, root,
      (0L until 100L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1), props)
    (1 to 12).foreach { b =>
      Snapshots.append(spark, root,
        (0L until 100L).map(i => (b * 100L + i, i * 1.0)).toDF("k", "v").coalesce(1))
    }
    val v = Snapshots.latestVersion(spark, root)
    Seq("k BETWEEN 320 AND 340", "k > 99999", "k >= 0", "v >= 50.0 AND k < 500")
      .foreach { pred =>
        val dist = Snapshots.statsCandidateFiles(spark, root, v, pred)
        spark.conf.set("spark.graft.prune.distributed", "never")
        val drv =
          try Snapshots.statsCandidateFiles(spark, root, v, pred)
          finally spark.conf.unset("spark.graft.prune.distributed")
        assert(dist == drv, s"sidecar distributed vs driver prune diverged for: $pred")
      }
    val tight = Snapshots.statsCandidateFiles(spark, root, v, "k BETWEEN 320 AND 340")
    assert(tight.nonEmpty && tight.size < Snapshots.versionFiles(spark, root, v).size)
    // metadata-only COUNT(*) still answers through the assembled rows
    assert(Snapshots.rowCount(spark, root) == Some(1300L))
  }

  test("vacuum reclaims DEAD sidecars, keeps referenced ones, reads stay exact") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((0L, 0.0)).toDF("k", "v"), props)
    (1 to 25).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 5L).map(i => (b * 100L + i, i * 1.0)).toDF("k", "v").coalesce(1))
    }
    // churn: OPTIMIZE rewrites everything → old sidecar rows all tombstoned
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30)
    (1 to 10).foreach { b =>
      Snapshots.append(spark, root, Seq((90000L + b, 1.0)).toDF("k", "v"))
    }
    val head = Snapshots.latestVersion(spark, root)
    val before = sidecarNames(root).size
    val rows = Snapshots.readVersion(spark, root).count()
    Snapshots.vacuum(spark, root, keepFrom = head - 2)
    assert(Snapshots.readVersion(spark, root).count() == rows,
      "reads must be exact after vacuum")
    val after = sidecarNames(root).size
    assert(after <= before, s"vacuum must not grow the sidecar set ($before -> $after)")
    // surviving manifests' references all resolve
    val (survCkpts) = logNames(root).filter(_.endsWith(".checkpoint.parquet"))
    assert(survCkpts.nonEmpty)
    val live = survCkpts.flatMap { n =>
      spark.read.parquet(s"$root/_log/$n").filter(col("kind") === "sidecar")
        .select("hval").as[String].collect()
    }.toSet
    assert(live.subsetOf(sidecarNames(root).toSet),
      "every surviving reference must resolve to a surviving sidecar")
  }

  test("pure appends accumulate ZERO tombstones; removes create exactly theirs") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((0L, 0.0)).toDF("k", "v"), props)
    (1 to 25).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 5L).map(i => (b * 100L + i, i * 1.0)).toDF("k", "v").coalesce(1))
    }
    def tombs(v: Long): Seq[String] =
      spark.read.parquet(f"$root/_log/v$v%08d.checkpoint.parquet")
        .filter(col("kind") === "tomb").select("path").as[String].collect().toSeq
    // the dominant 100-TB workload is append-only: its manifests must
    // carry NO tombstones (r15 tombstoned every touched path, so the
    // tomb set grew linearly with ADDS and tripped the full-compact cap
    // every ~100k files — the 100k steady_ckpt spike)
    Seq(10L, 20L).foreach(v =>
      assert(tombs(v).isEmpty, s"append-only manifest at v$v must be tomb-free"))
    // a delete tombstones exactly files that are no longer live
    val preDelete = Snapshots.versionFiles(spark, root).toSet
    Snapshots.deleteWhere(spark, root, "k <= 103") // kills seed + one append file
    (1 to 9).foreach(b => Snapshots.append(spark, root,
      Seq((90000L + b, 1.0)).toDF("k", "v")))
    val head = Snapshots.latestVersion(spark, root)
    val t = tombs(head / 10 * 10)
    assert(t.nonEmpty, "a COW delete's removes must tombstone")
    val liveNow = Snapshots.versionFiles(spark, root).toSet
    assert(t.forall(p => preDelete.exists(_.endsWith(s"/$p")) &&
      !liveNow.exists(_.endsWith(s"/$p"))),
      s"every tombstone must name a previously-live, now-dead file: $t")
    // and reads stay exact through the tomb-bearing manifest
    assert(Snapshots.readVersion(spark, root).count() == 1 + 25 * 5 - 4 + 9)
  }

  test("size-tiered fold: ref cap folds the SMALLEST sidecars, bootstrap survives") {
    val root = tmp()
    val tiered = props + ("graft.checkpoint.sidecar.spillRows" -> "5")
    // 4 real seed files (k 1..100); the v10 sidecar is the BIG one
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(4), tiered)
    def metaCommit(from: Int, count: Int): Unit = {
      val adds = (0 until count).map { j =>
        val fileNo = from + j
        val lo = 10000L + fileNo * 100L
        val rel = f"data/part-$fileNo%05d.parquet"
        rel -> graft.core.Skipping.FileStats(rel, 10L,
          Map("k" -> lo), Map("k" -> (lo + 99L)),
          Map.empty, Map.empty, Map.empty, Map.empty, Map("k" -> 0L))
      }
      Snapshots.commitMetadataOnlyAdds(spark, root, adds.map(_._1), adds.toMap,
        adds.map { case (rel, _) => rel -> (1024L * 1024, 1700000000000L) }.toMap)
    }
    // v1..v9: 10 adds each → the v10 boundary spills ONE ~91-row sidecar
    // (the big one a fold must never rewrite); then single adds per
    // commit: a 5-row spill bound spills every boundary, refs grow
    // 1/boundary until the cap (16) trips at the v160 boundary
    (0 until 9).foreach(c => metaCommit(c * 10, 10))    // v1..v9
    (0 until 141).foreach(i => metaCommit(90 + i, 1))   // v10..v150
    // a REAL delete right before the folding boundary: its tombstones
    // land in the SAME manifest the fold builds (stats keep the
    // synthetic files out of the candidate read)
    Snapshots.deleteWhere(spark, root, "k <= 50")       // v151
    val before = Snapshots.SidecarMaintenance.snapshot
    (0 until 15).foreach(i => metaCommit(300 + i, 1))   // crosses v160: fold
    val after = Snapshots.SidecarMaintenance.snapshot
    assert(after._4 > before._4, "a fold must have fired at the ref cap")
    val head = Snapshots.latestVersion(spark, root)
    val cv = head / 10 * 10
    val manifest = spark.read.parquet(f"$root/_log/v$cv%08d.checkpoint.parquet")
    val refs = manifest.filter(col("kind") === "sidecar")
      .select("hkey", "hval", "rows")
      .collect().map(r => (r.getString(0).toLong, r.getString(1), r.getLong(2)))
    assert(refs.length < 16, s"fold must have shrunk the ref set, got ${refs.length}")
    // the BIG v10 sidecar (~91 rows) was NOT rewritten: its generation
    // survives as an existing ref while the small ones folded
    assert(refs.exists(r => r._1 == 10L && r._3 > 50L),
      s"the big sidecar must survive a size-tiered fold, refs=${refs.toSeq}")
    assert(Snapshots.maintenanceEvents.toArray.map(_.toString)
      .exists(m => m.contains("size-tiered fold") && m.contains(root)),
      "the fold must be visibly logged")
    // exactness: reconstruction at EVERY version equals pure delta replay
    val viaCkpt = (0L to head).map(v => Snapshots.versionFiles(spark, root, v))
    val p = new Path(root + "/_log")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    logNames(root).filter(_.endsWith(".checkpoint.parquet"))
      .foreach(n => fs.delete(new Path(p, n), true))
    Snapshots.invalidateCaches(spark, root)
    assert((0L to head).map(v => Snapshots.versionFiles(spark, root, v)) == viaCkpt,
      "fold-assembled reconstruction must equal from-v0 replay at EVERY version")
  }

  test("reader feature gate + DROP FEATURE refusal while references survive") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((0L, 0.0)).toDF("k", "v"), props)
    (1 to 25).foreach { b =>
      Snapshots.append(spark, root, Seq((b * 10L, 1.0)).toDF("k", "v"))
    }
    val (_, _, rfeat, wfeat) = Snapshots.protocol(spark, root)
    assert(rfeat.contains("checkpointSidecars") && rfeat.contains("parquetCheckpoint"))
    assert(wfeat.contains("checkpointSidecars"))
    // dropping while the prop is on refuses
    val e1 = intercept[Exception](
      Snapshots.dropFeature(spark, root, "checkpointSidecars"))
    assert(e1.getMessage.contains("unset it first"))
    // prop off but references survive: still refuses, names the versions
    Snapshots.setProperties(spark, root, Map.empty,
      unset = Seq(Snapshots.checkpointSidecarsProp))
    val e2 = intercept[Exception](
      Snapshots.dropFeature(spark, root, "checkpointSidecars"))
    assert(e2.getMessage.contains("still reference"))
  }

  test("format=auto flips to sidecar manifests past the live-file threshold, exits on -1") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((0L, 0.0)).toDF("k", "v").coalesce(1),
      Map(Snapshots.checkpointFormatProp -> "auto",
        "graft.checkpoint.autoThreshold" -> "5",
        "graft.checkpoint.auto.sidecarsAt" -> "15",
        "graft.checkpoint.sidecar.spillRows" -> "10"))
    // the flip may fire at any commit, so the reader feature is stamped
    // from the FIRST commit, like auto's parquetCheckpoint stamp
    assert(Snapshots.protocol(spark, root)._3.contains("checkpointSidecars"))
    (1 to 10).foreach { b =>
      Snapshots.append(spark, root, Seq((b * 10L, 1.0)).toDF("k", "v").coalesce(1))
    }
    def refsOf(v: Long): Long =
      spark.read.parquet(f"$root/_log/v$v%08d.checkpoint.parquet")
        .filter(col("kind") === "sidecar").count()
    // v10: 11 live files ≥ auto threshold (parquet codec) but < 15 —
    // still a PLAIN checkpoint
    assert(logNames(root).contains("v00000010.checkpoint.parquet"))
    assert(refsOf(10L) == 0L, "below the flip threshold the layout stays plain")
    (11 to 20).foreach { b =>
      Snapshots.append(spark, root, Seq((b * 10L, 1.0)).toDF("k", "v").coalesce(1))
    }
    // v20: 21 live files ≥ 15 — the checkpoint is now a thin MANIFEST
    assert(refsOf(20L) > 0L, "past the threshold the auto table writes sidecar manifests")
    assert(sidecarNames(root).nonEmpty)
    Snapshots.invalidateCaches(spark, root)
    assert(Snapshots.readVersion(spark, root).count() == 21L)
    // hysteresis: later boundaries STAY manifests even if count hovers
    (21 to 30).foreach { b =>
      Snapshots.append(spark, root, Seq((b * 10L, 1.0)).toDF("k", "v").coalesce(1))
    }
    assert(refsOf(30L) > 0L, "once flipped, the table stays in manifests")
    // exit ramp: disarming the flip writes one full plain checkpoint
    Snapshots.setProperties(spark, root,
      Map("graft.checkpoint.auto.sidecarsAt" -> "-1"))
    (1 to 9).foreach { b =>
      Snapshots.append(spark, root, Seq((4000L + b, 4.0)).toDF("k", "v").coalesce(1))
    }
    val head = Snapshots.latestVersion(spark, root)
    assert(head % 10 == 0, s"expected a boundary, got $head")
    assert(refsOf(head) == 0L, "disarming exits to the plain layout")
    Snapshots.invalidateCaches(spark, root)
    assert(Snapshots.readVersion(spark, root).count() == 40L)
  }
}
