package graft.jobs

import java.nio.file.{Files, Path => JPath, Paths}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The r17 distributed-selection tier: vacuum / restore / OPTIMIZE
  * candidate selection and full rebuilds run on the EXECUTORS, with the
  * driver collecting only the O(change) difference. Every path is
  * pinned EQUAL to the exact driver fallback (`spark.graft.prune
  * .distributed = never` flips it), and the live-meta cache's driver
  * heap is pinned to its row budget. */
class DistributedLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("distlc").toFile.getAbsolutePath + "/t"

  /** Byte-exact recursive copy — two identical tables let a mutating
    * operation run once per selection mode and compare outcomes. */
  private def cloneDir(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).forEach { p: JPath =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  private def driverOnly[A](f: => A): A = {
    spark.conf.set("spark.graft.prune.distributed", "never")
    try f finally spark.conf.unset("spark.graft.prune.distributed")
  }

  /** Parquet-codec table with a mixed history: appends, a COW delete
    * (wide remove+add), a compact, more appends — enough churn that
    * vacuum has real orphans. */
  private def mixedTable(root: String, extraProps: Map[String, String] = Map.empty): Long = {
    Snapshots.init(spark, root,
      (1L to 60L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(3),
      Map(Snapshots.checkpointFormatProp -> "parquet") ++ extraProps)
    (1 to 11).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 10L).map(i => (b * 1000L + i, i * 2.0)).toDF("k", "v").repartition(2))
    }
    Snapshots.deleteWhere(spark, root, "k <= 30")
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30)
    (1 to 3).foreach { b =>
      Snapshots.append(spark, root, Seq((90000L + b, 3.0)).toDF("k", "v"))
    }
    Snapshots.latestVersion(spark, root)
  }

  test("vacuumPlan: distributed selection equals the driver path exactly") {
    val root = tmp()
    val head = mixedTable(root)
    val keepFrom = head - 4
    val dist = Snapshots.vacuumPlan(spark, root, keepFrom)
    val drv = driverOnly(Snapshots.vacuumPlan(spark, root, keepFrom))
    assert(dist.nonEmpty, "the mixed history must have real orphans")
    assert(dist == drv, s"distributed $dist != driver $drv")
  }

  test("vacuum with distributed selection deletes orphans, keeps every retained version readable") {
    val root = tmp()
    val head = mixedTable(root)
    val keepFrom = head - 3
    val planned = Snapshots.vacuumPlan(spark, root, keepFrom)
    val before = (keepFrom to head).map(v =>
      Snapshots.readVersion(spark, root, v).count())
    val n = Snapshots.vacuum(spark, root, keepFrom)
    assert(n == planned.size)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    planned.foreach(f => assert(!fs.exists(new Path(f)), s"$f must be gone"))
    Snapshots.invalidateCaches(spark, root)
    (keepFrom to head).zip(before).foreach { case (v, c) =>
      assert(Snapshots.readVersion(spark, root, v).count() == c,
        s"v$v must still read after vacuum")
    }
  }

  test("restore: distributed diff commits the same delta as the driver path") {
    val rootA = tmp()
    mixedTable(rootA)
    val rootB = tmp()
    cloneDir(rootA.stripSuffix("/t"), rootB.stripSuffix("/t"))
    val target = Snapshots.latestVersion(spark, rootA) - 6
    val va = Snapshots.restore(spark, rootA, target)
    Snapshots.invalidateCaches(spark, rootB)
    val vb = driverOnly(Snapshots.restore(spark, rootB, target))
    assert(va == vb)
    val da = Snapshots.versions(spark, rootA).last
    val a = Snapshots.readVersion(spark, rootA, da)
    val b = Snapshots.readVersion(spark, rootB, vb)
    assert(a.orderBy("k").collect().toSeq == b.orderBy("k").collect().toSeq)
    // the deltas themselves must agree: same re-adds, removes AND stats
    val la = Snapshots.tableProperties(spark, rootA) // force delta reads
    assert(la == Snapshots.tableProperties(spark, rootB))
    val fa = Snapshots.versionFiles(spark, rootA).map(_.split("/t/").last).sorted
    val fb = Snapshots.versionFiles(spark, rootB).map(_.split("/t/").last).sorted
    assert(fa == fb)
  }

  test("optimizeCompact: distributed victim selection equals the driver stat loop") {
    val rootA = tmp()
    Snapshots.init(spark, rootA,
      (1L to 50000L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1),
      Map(Snapshots.checkpointFormatProp -> "parquet"))
    (1 to 10).foreach { b =>
      Snapshots.append(spark, rootA,
        Seq((100000L + b, 1.0)).toDF("k", "v").coalesce(1)) // tiny files
    }
    val rootB = tmp()
    cloneDir(rootA.stripSuffix("/t"), rootB.stripSuffix("/t"))
    val cutoff = 64L * 1024 // the big init file stays, the 10 tiny ones pack
    val va = Snapshots.optimizeCompact(spark, rootA, cutoff)
    Snapshots.invalidateCaches(spark, rootB)
    val vb = driverOnly(Snapshots.optimizeCompact(spark, rootB, cutoff))
    assert(va > 0 && vb > 0)
    // identical victim sets ⇒ identical survivor counts (new pack file
    // names differ by UUID, so compare structure + content)
    assert(Snapshots.versionFiles(spark, rootA).size ==
      Snapshots.versionFiles(spark, rootB).size)
    val ca = Snapshots.readVersion(spark, rootA).count()
    assert(ca == Snapshots.readVersion(spark, rootB).count())
  }

  test("text→parquet conversion assembles the live rows distributed, exactly") {
    val root = tmp()
    // TEXT regime with the distributed-parse floor dropped to zero so
    // the small fixture takes the executor path
    Snapshots.init(spark, root,
      (1L to 40L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(2),
      Map("graft.checkpoint.distributedTextMinBytes" -> "0"))
    (1 to 10).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 5L).map(i => (b * 100L + i, i * 1.0)).toDF("k", "v").coalesce(1))
    } // v10 lands a TEXT checkpoint
    val preFlip = Snapshots.versionFiles(spark, root)
    // flip the codec; the next boundary's first parquet checkpoint
    // bootstraps from the text checkpoint — on the executors
    Snapshots.setProperties(spark, root,
      Map(Snapshots.checkpointFormatProp -> "parquet"))
    (1 to 9).foreach { b =>
      Snapshots.append(spark, root, Seq((7000L + b, 9.0)).toDF("k", "v").coalesce(1))
    } // v20 lands the first parquet checkpoint
    val head = Snapshots.latestVersion(spark, root)
    assert(head == 20L)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(root, f"_log/v$head%08d.checkpoint.parquet")))
    Snapshots.invalidateCaches(spark, root)
    // the parquet assembly must agree with the driver replay exactly
    val viaFrame = Snapshots.versionFiles(spark, root, head).sorted
    val viaDriver = driverOnly {
      Snapshots.invalidateCaches(spark, root)
      Snapshots.versionFiles(spark, root, head).sorted
    }
    assert(viaFrame == viaDriver)
    assert(viaFrame.toSet.intersect(preFlip.toSet) == preFlip.toSet.intersect(viaFrame.toSet))
    // stats survived the executor-side parse: pruning still cuts files
    val pruned = Snapshots.statsCandidateFiles(spark, root, head, "k >= 7000")
    assert(pruned.nonEmpty && pruned.size < viaFrame.size)
    // and the data reads whole
    assert(Snapshots.readVersion(spark, root, head).count() == 40L + 50L + 9L)
  }

  test("liveMetaCache holds no more than its row budget (full-scan heap pin)") {
    val roots = (1 to 3).map { _ =>
      val r = tmp()
      Snapshots.init(spark, r,
        (1L to 20L).map(i => (i, i * 1.0)).toDF("k", "v").coalesce(1),
        Map(Snapshots.checkpointFormatProp -> "parquet"))
      (1 to 10).foreach { b =>
        Snapshots.append(spark, r, Seq((b * 10L, 1.0)).toDF("k", "v").coalesce(1))
      }
      r
    }
    Snapshots.invalidateCaches(spark, roots.head)
    roots.foreach(r => Snapshots.invalidateCaches(spark, r))
    spark.conf.set("spark.graft.meta.cacheRows", "15")
    try {
      roots.foreach { r =>
        val head = Snapshots.latestVersion(spark, r)
        // plan a FULL scan through the front door
        assert(graft.sources.SnapshotPlanProbe.planFiles(spark, r, head) == 11L)
      }
      // each entry is 11 rows < 15, but two would breach the budget —
      // the cache must hold at most ONE (the most recent), never all 3
      assert(Snapshots.liveMetaCacheRows <= 15L,
        s"cache holds ${Snapshots.liveMetaCacheRows} rows, budget 15")
      // an over-budget single version is cached ALONE, not rejected
      spark.conf.set("spark.graft.meta.cacheRows", "5")
      val r0 = roots.head
      Snapshots.invalidateCaches(spark, r0)
      assert(graft.sources.SnapshotPlanProbe.planFiles(
        spark, r0, Snapshots.latestVersion(spark, r0)) == 11L)
      assert(Snapshots.liveMetaCacheRows == 11L,
        "one over-budget entry rides alone (the plan's own transient heap)")
    } finally spark.conf.unset("spark.graft.meta.cacheRows")
  }

  test("restore on a PARTITIONED table: both selection modes commit identical stats") {
    // the distributed diff strips baked partition point-envelopes from
    // re-add stats; the driver fallback (reconstruct seeded from a
    // parquet checkpoint) must strip them identically or the two modes
    // commit different delta stats
    def partTable(root: String): Long = {
      val df = (1L to 60L).map(i => (i, i % 3, i * 1.0)).toDF("k", "p", "v")
      Snapshots.init(spark, root, df.repartition(2),
        Map(Snapshots.checkpointFormatProp -> "parquet",
          "graft.partitionBy" -> "p"))
      (1 to 11).foreach { b =>
        Snapshots.append(spark, root,
          (1L to 6L).map(i => (b * 1000L + i, i % 3, i * 2.0))
            .toDF("k", "p", "v").repartition(2))
      }
      Snapshots.deleteWhere(spark, root, "k <= 20")
      (1 to 3).foreach(b =>
        Snapshots.append(spark, root, Seq((90000L + b, b % 3, 3.0)).toDF("k", "p", "v")))
      Snapshots.latestVersion(spark, root)
    }
    val rootA = tmp()
    val head = partTable(rootA)
    val rootB = tmp()
    cloneDir(rootA.stripSuffix("/t"), rootB.stripSuffix("/t"))
    val target = head - 6
    val va = Snapshots.restore(spark, rootA, target)
    Snapshots.invalidateCaches(spark, rootB)
    val vb = driverOnly(Snapshots.restore(spark, rootB, target))
    assert(va == vb)
    val fa = Snapshots.versionFiles(spark, rootA).map(_.split("/t/").last).sorted
    val fb = Snapshots.versionFiles(spark, rootB).map(_.split("/t/").last).sorted
    assert(fa == fb)
    // the STATS indexes must agree file-by-file — including the absence
    // of baked partition-column envelopes on the restore re-adds
    Snapshots.invalidateCaches(spark, rootA)
    Snapshots.invalidateCaches(spark, rootB)
    val sa = Snapshots.statsIndex(spark, rootA, va)
      .map(x => x.path.split("/t/").last -> x.copy(path = "")).toMap
    val sb = Snapshots.statsIndex(spark, rootB, vb)
      .map(x => x.path.split("/t/").last -> x.copy(path = "")).toMap
    assert(sa.keySet == sb.keySet)
    sa.keys.foreach { k =>
      assert(sa(k) == sb(k), s"stats differ on $k: ${sa(k)} vs ${sb(k)}")
    }
    val a = Snapshots.readVersion(spark, rootA, va).orderBy("k").collect().toSeq
    val b = Snapshots.readVersion(spark, rootB, vb).orderBy("k").collect().toSeq
    assert(a == b)
  }

  /** Partitioned churn table shared by the vacuum and OPTIMIZE parity
    * legs (r18 VERDICT task 5 — restore got its partitioned leg in
    * r18; the same point-envelope/selection bug class could lurk in
    * the other two lifecycle ops). */
  private def partMixedTable(root: String): Long = {
    val df = (1L to 60L).map(i => (i, i % 3, i * 1.0)).toDF("k", "p", "v")
    Snapshots.init(spark, root, df.repartition(2),
      Map(Snapshots.checkpointFormatProp -> "parquet",
        "graft.partitionBy" -> "p"))
    (1 to 11).foreach { b =>
      Snapshots.append(spark, root,
        (1L to 6L).map(i => (b * 1000L + i, i % 3, i * 2.0))
          .toDF("k", "p", "v").repartition(2))
    }
    Snapshots.deleteWhere(spark, root, "k <= 20")
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30)
    (1 to 3).foreach(b =>
      Snapshots.append(spark, root, Seq((90000L + b, b % 3, 3.0)).toDF("k", "p", "v")))
    Snapshots.latestVersion(spark, root)
  }

  test("vacuum on a PARTITIONED table: distributed selection equals the driver path, retained versions read") {
    val root = tmp()
    val head = partMixedTable(root)
    val keepFrom = head - 4
    val dist = Snapshots.vacuumPlan(spark, root, keepFrom)
    val drv = driverOnly(Snapshots.vacuumPlan(spark, root, keepFrom))
    assert(dist.nonEmpty, "the partitioned mixed history must have real orphans")
    assert(dist == drv, s"distributed $dist != driver $drv")
    val before = (keepFrom to head).map(v =>
      Snapshots.readVersion(spark, root, v).count())
    val n = Snapshots.vacuum(spark, root, keepFrom)
    assert(n == dist.size)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    dist.foreach(f => assert(!fs.exists(new Path(f)), s"$f must be gone"))
    Snapshots.invalidateCaches(spark, root)
    (keepFrom to head).zip(before).foreach { case (v, c) =>
      assert(Snapshots.readVersion(spark, root, v).count() == c,
        s"v$v must still read after vacuum")
    }
  }

  test("optimizeCompact on a PARTITIONED table: both selection modes pack the same victims with the same stats") {
    val rootA = tmp()
    // three BIG per-partition init files (survive the cutoff) + ten
    // tiny appends scattered across partitions (the victims)
    Snapshots.init(spark, rootA,
      (1L to 90000L).map(i => (i, i % 3, i * 1.0)).toDF("k", "p", "v").coalesce(1),
      Map(Snapshots.checkpointFormatProp -> "parquet",
        "graft.partitionBy" -> "p"))
    (1 to 10).foreach { b =>
      Snapshots.append(spark, rootA,
        Seq((100000L + b, b % 3L, 1.0)).toDF("k", "p", "v").coalesce(1))
    }
    val head = Snapshots.latestVersion(spark, rootA)
    val rootB = tmp()
    cloneDir(rootA.stripSuffix("/t"), rootB.stripSuffix("/t"))
    val cutoff = 64L * 1024 // big init files stay, the 10 tiny ones pack
    val va = Snapshots.optimizeCompact(spark, rootA, cutoff)
    Snapshots.invalidateCaches(spark, rootB)
    val vb = driverOnly(Snapshots.optimizeCompact(spark, rootB, cutoff))
    assert(va > 0 && vb > 0 && va == vb && va == head + 1)
    val fa = Snapshots.versionFiles(spark, rootA)
    val fb = Snapshots.versionFiles(spark, rootB)
    assert(fa.size == fb.size)
    // 3 surviving big init files + one pack file per partition: the
    // selection DIFFERENTIATED (a mode that packed the big files too
    // would land at 3 files; one that packed nothing stays at 13)
    assert(fa.size == 6, s"expected 3 survivors + 3 packs, got ${fa.size}")
    // per-partition live layout must agree (a pack that mixed partition
    // dirs, or victim sets that differ by mode, would break this)
    def perDir(files: Seq[String]): Map[String, Int] =
      files.map(_.split('/').dropRight(1).filter(_.contains('=')).mkString("/"))
        .groupBy(identity).map { case (d, xs) => d -> xs.size }
    assert(perDir(fa) == perDir(fb))
    // stats envelopes must agree as a multiset (pack file names differ
    // by UUID) — including the partition point-envelope treatment on
    // the re-added pack files
    Snapshots.invalidateCaches(spark, rootA)
    Snapshots.invalidateCaches(spark, rootB)
    val sa = Snapshots.statsIndex(spark, rootA, va)
      .map(_.copy(path = "").toString).sorted
    val sb = Snapshots.statsIndex(spark, rootB, vb)
      .map(_.copy(path = "").toString).sorted
    assert(sa == sb, "stats multisets differ between selection modes")
    val a = Snapshots.readVersion(spark, rootA, va).orderBy("k").collect().toSeq
    val b = Snapshots.readVersion(spark, rootB, vb).orderBy("k").collect().toSeq
    assert(a == b)
  }
}
