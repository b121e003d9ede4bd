package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Feature-COMPOSITION gauntlet: widen → OPTIMIZE → COPY INTO old-width
  * batches → explicit-id append → SYNC IDENTITY on ONE table, pinning
  * the row hash, the identity high-water mark, and stats-envelope
  * validity after EVERY step. Each feature is individually green in the
  * oracle registry; this spec exists for the class of bug only their
  * composition shows (a widened envelope mispruning, an OPTIMIZE
  * dropping identity ids, a COPY batch landing NULL ids). */
class InteropGauntletSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("widen -> OPTIMIZE -> COPY INTO old-width -> SYNC IDENTITY composes") {
    val base = Files.createTempDirectory("gaunt").toFile.getAbsolutePath
    val root = s"$base/t"
    val landing = s"$base/landing"

    // ---- state checker: hash (count + sums), id uniqueness, hwm, and
    // envelope VALIDITY (a stats-pruned filtered read returns exactly
    // the rows a full predicate scan does — a stale envelope after
    // widen/rewrite would silently drop files here)
    def check(tag: String, expN: Long, expK: Long, expV: Long,
        expHwmAtLeast: Long): Unit = {
      val df = Snapshots.readVersion(spark, root)
      val r = df.agg(count(lit(1)), sum(col("k")).cast("long"),
        sum(col("v")).cast("long")).head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((expN, expK, expV)),
        s"$tag: hash (n,sumK,sumV) = $r, expected ($expN,$expK,$expV)")
      assert(df.select(countDistinct(col("rid"))).head().getLong(0) == expN,
        s"$tag: identity ids must stay unique and non-null")
      val hwm = Snapshots.tableProperties(spark, root)
        .get("graft.identity.rid.hwm").flatMap(_.toLongOption).getOrElse(0L)
      assert(hwm >= expHwmAtLeast, s"$tag: hwm $hwm < $expHwmAtLeast")
      // envelope validity: counts through the (stats-pruned) front door
      // match the predicate's arithmetic truth on three band shapes
      val head = Snapshots.latestVersion(spark, root)
      Seq("k >= 150", "k < 40", "k >= 90 AND k < 120").foreach { p =>
        val got = df.where(expr(p)).count()
        val want = Snapshots.readVersion(spark, root)
          .collect().count(row => {
            val k = row.getAs[Number]("k").longValue()
            p match {
              case "k >= 150" => k >= 150
              case "k < 40" => k < 40
              case _ => k >= 90 && k < 120
            }
          }).toLong
        assert(got == want, s"$tag: filtered read under '$p' got $got want $want")
        val cand = Snapshots.statsCandidateFiles(spark, root, head, p)
        assert(cand.size <= Snapshots.versionFiles(spark, root).size,
          s"$tag: candidates bounded by the file list")
      }
    }

    // v0: 200 rows, k 1..200, v = 10k (INT), identity rid, range-laid-out
    // so envelopes are tight enough for real pruning
    Snapshots.init(spark, root,
      (1 to 200).map(i => (i, i * 10)).toDF("k", "v")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      Map("graft.identity.rid" -> "1,1"))
    val sumK = 200L * 201 / 2
    check("init", 200, sumK, sumK * 10, 200)
    // the init layout really prunes: a tight band hits a strict subset
    assert(Snapshots.statsCandidateFiles(spark, root, 0L, "k < 40").size <
      Snapshots.versionFiles(spark, root).size,
      "range layout must let the envelope prune files")

    // STEP 1 — widen v INT -> BIGINT (metadata-only; old files stay INT)
    Snapshots.alterColumnType(spark, root, "v", LongType)
    assert(Snapshots.readVersion(spark, root).schema("v").dataType == LongType)
    check("widen", 200, sumK, sumK * 10, 200)

    // STEP 2 — OPTIMIZE compacts the widened table (rewrites files under
    // the WIDE schema; envelopes re-collected from the new files)
    Snapshots.optimizeCompact(spark, root, smallerThanBytes = 1L << 30,
      targetFileBytes = 1L << 30)
    check("optimize", 200, sumK, sumK * 10, 200)

    // STEP 3a — COPY INTO an OLD-WIDTH parquet batch (v still INT32 in
    // the landing files, rid absent): upcast + identity injection
    (201 to 250).map(i => (i, i * 10)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$landing/b0")
    val r1 = Snapshots.copyInto(spark, root, landing)
    assert(r1.rowsInserted == 50L, r1.toString)
    val sumK250 = 250L * 251 / 2
    check("copy-parquet", 250, sumK250, sumK250 * 10, 250)

    // STEP 3b — COPY INTO a CSV batch lacking rid entirely: the
    // all-NULL drop must fire injection, never land NULL ids
    val w = new java.io.PrintWriter(s"$landing/b1.csv")
    w.println("k,v")
    (251 to 260).foreach(i => w.println(s"$i,${i * 10}"))
    w.close()
    val r2 = Snapshots.copyInto(spark, root, landing, format = "csv",
      formatOptions = Map("header" -> "true"))
    assert(r2.rowsInserted == 10L, r2.toString)
    val sumK260 = 260L * 261 / 2
    check("copy-csv", 260, sumK260, sumK260 * 10, 260)

    // STEP 4 — an explicit-id append ABOVE the hwm (GENERATED BY DEFAULT
    // admits it), then SYNC IDENTITY advances the hwm past it.
    // Allocated ids are SPARSE (monotonically_increasing_id encodes the
    // partition index in high bits — gaps are the documented admission),
    // so "above" is relative to the ACTUAL hwm, not the row count.
    val hwm0 = Snapshots.tableProperties(spark, root)("graft.identity.rid.hwm").toLong
    Snapshots.append(spark, root,
      Seq((261, 2610L, hwm0 + 5000L), (262, 2620L, hwm0 + 5001L))
        .toDF("k", "v", "rid"))
    val sumK262 = sumK260 + 261 + 262
    check("explicit-append", 262, sumK262, sumK262 * 10, hwm0) // hwm lags
    assert(Snapshots.tableProperties(spark, root)("graft.identity.rid.hwm").toLong
      == hwm0, "an explicit-id append must NOT advance the hwm")
    val synced = Snapshots.syncIdentity(spark, root)
    assert(synced == Seq("rid" -> (hwm0 + 5001L)), synced.toString)
    check("sync-identity", 262, sumK262, sumK262 * 10, hwm0 + 5001L)

    // STEP 5 — the NEXT copy allocates above the synced hwm: no collision
    (263 to 264).map(i => (i, i * 10L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$landing/b2")
    val r3 = Snapshots.copyInto(spark, root, landing)
    assert(r3.rowsInserted == 2L, r3.toString)
    val sumK264 = sumK262 + 263 + 264
    check("post-sync-copy", 264, sumK264, sumK264 * 10, hwm0 + 5001L)
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") >= 263).select(min(col("rid"))).head().getLong(0)
      > hwm0 + 5001L,
      "post-sync ids allocate above the synced hwm")
    assert(Snapshots.readVersion(spark, root)
      .select(countDistinct(col("rid"))).head().getLong(0) == 264L,
      "no id collision across the whole gauntlet")
  }

  test("parquet checkpoint x compaction x vacuumRetain x DROP FEATURE composes") {
    // the r14 metadata tier composed on ONE table: columnar checkpoints
    // carrying the manifest, MOR deletes leaving vectors, small-file
    // compaction rewriting under the checkpointed layout, a retention
    // vacuum dropping history BELOW a parquet checkpoint, and a protocol
    // downgrade at the end — the hash pinned after EVERY step, and the
    // per-step file list always reconstructable.
    val root = Files.createTempDirectory("gaunt2").toFile.getAbsolutePath + "/t"

    def check(tag: String, expN: Long, expK: Long): Unit = {
      val df = Snapshots.readVersion(spark, root)
      val r = df.agg(count(lit(1)), sum(col("k")).cast("long")).head()
      assert((r.getLong(0), r.getLong(1)) == ((expN, expK)),
        s"$tag: (n,sumK) = (${r.getLong(0)},${r.getLong(1)}), " +
          s"expected ($expN,$expK)")
      // the metadata path serves every surviving version
      Snapshots.versions(spark, root).foreach(v =>
        assert(Snapshots.versionFiles(spark, root, v).nonEmpty ||
          Snapshots.readVersion(spark, root, v).count() >= 0))
    }

    // v0 + 11 small appends → checkpoints at v0 and v10, all columnar
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map(Snapshots.checkpointFormatProp -> "parquet"))
    (1 to 11).foreach(b => Snapshots.append(spark, root,
      (1L to 10L).map(i => (1000L + b * 100L + i, 0.5)).toDF("k", "v").coalesce(1)))
    val sum0 = (1L to 100L).sum +
      (1 to 11).map(b => (1L to 10L).map(1000L + b * 100L + _).sum).sum
    check("ingest", 210, sum0)

    // MOR delete leaves a vector; compaction bin-packs the small files
    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    val sum1 = sum0 - (1L to 10L).sum
    check("mor-delete", 200, sum1)
    val preFiles = Snapshots.versionFiles(spark, root).size
    Snapshots.optimizeCompact(spark, root, smallerThanBytes = 1L << 20,
      targetFileBytes = 1L << 30)
    assert(Snapshots.versionFiles(spark, root).size < preFiles, "compacted")
    check("compact", 200, sum1)
    // compaction bin-packed the SMALL files; the DV'd init file carried
    // over by reference WITH its vector — materialization is its own
    // explicit step (REORG ... APPLY (PURGE))
    assert(Snapshots.liveDeletionVectors(spark, root).nonEmpty)
    Snapshots.materializeDeletionVectors(spark, root)
    assert(Snapshots.liveDeletionVectors(spark, root).isEmpty)
    check("materialize", 200, sum1)

    // retention vacuum: keep the last 3 versions — the floor checkpoint
    // lands COLUMNAR and pre-floor parquet checkpoints are reclaimed
    val headBefore = Snapshots.latestVersion(spark, root)
    Snapshots.vacuumRetain(spark, root, retainLast = 3, olderThanMs = 0L)
    val vs = Snapshots.versions(spark, root)
    assert(vs.min == headBefore - 2 && vs.max == headBefore, vs.toString)
    check("vacuum-retain", 200, sum1)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckpts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_log"))
      .map(_.getPath.getName).filter(_.contains(".checkpoint"))
    assert(ckpts.nonEmpty && ckpts.forall(_.endsWith(".checkpoint.parquet")),
      s"floor checkpoint must be columnar: ${ckpts.toSeq}")

    // protocol downgrade at the end: DVs are gone (compaction
    // materialized), so deletionVectors drops; then vacuum truncates
    // the marks and EVERY surviving version is minimal-reader-clean for
    // that feature
    val dropV = Snapshots.dropFeature(spark, root, "deletionVectors")
    check("drop-feature", 200, sum1)
    Snapshots.vacuum(spark, root, dropV)
    assert(Snapshots.versions(spark, root).forall(v =>
      !Snapshots.protocol(spark, root, v)._3.contains("deletionVectors")))
    check("truncate", 200, sum1)
    // parquetCheckpoint itself still gates (the format is still on)
    assert(Snapshots.protocol(spark, root)._3.contains("parquetCheckpoint"))
  }

  test("SIDECAR checkpoint x MOR x compaction x vacuum x full feature exit composes") {
    // the same metadata-tier composition over the sidecar manifest
    // shape, ending with the complete EXIT ramp: unset the property,
    // land a post-flip plain checkpoint, vacuum the referencing
    // manifests away, then DROP FEATURE checkpointSidecars — the one
    // sequence a table uses to hand itself back to a sidecar-unaware
    // reader build.
    val root = Files.createTempDirectory("gaunt3").toFile.getAbsolutePath + "/t"

    def check(tag: String, expN: Long, expK: Long): Unit = {
      val df = Snapshots.readVersion(spark, root)
      val r = df.agg(count(lit(1)), sum(col("k")).cast("long")).head()
      assert((r.getLong(0), r.getLong(1)) == ((expN, expK)),
        s"$tag: (n,sumK) = (${r.getLong(0)},${r.getLong(1)}), " +
          s"expected ($expN,$expK)")
      Snapshots.versions(spark, root).foreach(v =>
        assert(Snapshots.versionFiles(spark, root, v).nonEmpty ||
          Snapshots.readVersion(spark, root, v).count() >= 0))
    }

    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map(Snapshots.checkpointFormatProp -> "parquet",
        Snapshots.checkpointSidecarsProp -> "true",
        "graft.checkpoint.sidecar.spillRows" -> "20"))
    (1 to 11).foreach(b => Snapshots.append(spark, root,
      (1L to 10L).map(i => (1000L + b * 100L + i, 0.5)).toDF("k", "v").coalesce(1)))
    val sum0 = (1L to 100L).sum +
      (1 to 11).map(b => (1L to 10L).map(1000L + b * 100L + _).sum).sum
    check("ingest", 210, sum0)

    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    val sum1 = sum0 - (1L to 10L).sum
    check("mor-delete", 200, sum1)
    val preFiles = Snapshots.versionFiles(spark, root).size
    Snapshots.optimizeCompact(spark, root, smallerThanBytes = 1L << 20,
      targetFileBytes = 1L << 30)
    assert(Snapshots.versionFiles(spark, root).size < preFiles, "compacted")
    check("compact", 200, sum1)
    Snapshots.materializeDeletionVectors(spark, root)
    check("materialize", 200, sum1)

    Snapshots.vacuumRetain(spark, root, retainLast = 3, olderThanMs = 0L)
    check("vacuum-retain", 200, sum1)

    // ---- the exit ramp ----
    Snapshots.setProperties(spark, root, Map.empty,
      unset = Seq(Snapshots.checkpointSidecarsProp))
    // drive to the next checkpoint boundary: it lands PLAIN parquet
    val at = Snapshots.latestVersion(spark, root)
    ((at + 1) to (at / 10 * 10 + 10)).foreach { _ =>
      Snapshots.append(spark, root, Seq((999999L, 0.0)).toDF("k", "v"))
    }
    val n1 = 200L + (Snapshots.latestVersion(spark, root) - at)
    val k1 = sum1 + 999999L * (Snapshots.latestVersion(spark, root) - at)
    check("post-flip", n1, k1)
    // vacuum below the plain checkpoint: referencing manifests (and
    // their sidecars) go away
    Snapshots.vacuum(spark, root, Snapshots.latestVersion(spark, root))
    val dropV = Snapshots.dropFeature(spark, root, "checkpointSidecars")
    Snapshots.vacuum(spark, root, dropV)
    assert(Snapshots.versions(spark, root).forall(v =>
      !Snapshots.protocol(spark, root, v)._3.contains("checkpointSidecars")))
    check("feature-exit", n1, k1)
    val scDir = new org.apache.hadoop.fs.Path(s"$root/_log/_sidecars")
    val fs = scDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(scDir) || fs.listStatus(scDir).isEmpty,
      "the exit ramp must leave no sidecar debris")
  }

  test("FLAGSHIP composition: partitioned + sidecars + auto through a DML mix, " +
      "vacuum, and the exit ramp") {
    val root = Files.createTempDirectory("gauntpsc").toFile.getAbsolutePath + "/t"
    def mk(ks: Seq[Long], month: Int) =
      ks.map(k => (k, k * 2.0, month)).toDF("k", "v", "month")

    // the in-memory MIRROR: every step's expected row set, updated in
    // lockstep — reads compare EXACTLY (no hash shortcuts)
    var mirror = Set.empty[(Long, Double, Int)]
    def check(tag: String): Unit = {
      val got = Snapshots.readVersion(spark, root)
        .as[(Long, Double, Int)].collect().toSet
      assert(got == mirror,
        s"$tag: table diverged from mirror (got ${got.size}, want ${mirror.size}; " +
          s"missing=${(mirror -- got).take(3)}, extra=${(got -- mirror).take(3)})")
      // partition × data prune parity: distributed == driver, and the
      // tight band is a strict subset of the live set
      val head = Snapshots.latestVersion(spark, root)
      val pred = "month = 3 AND k >= 300"
      val dist = Snapshots.statsCandidateFiles(spark, root, head, pred)
      spark.conf.set("spark.graft.prune.distributed", "never")
      val drv =
        try Snapshots.statsCandidateFiles(spark, root, head, pred)
        finally spark.conf.unset("spark.graft.prune.distributed")
      assert(dist == drv, s"$tag: distributed vs driver prune diverged")
      // when a parquet checkpoint exists the aggr header answers
      // (count, bytes) exactly — the scale path stays truthful through
      // every composition step
      Snapshots.liveAggregate(spark, root, head).foreach { case (c, b) =>
        val qroot = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration).makeQualified(
          new org.apache.hadoop.fs.Path(root))
        val files = Snapshots.versionFiles(spark, root, head)
        val truth = (files.size.toLong, files.map(f => qroot.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum)
        assert((c, b) == truth, s"$tag: aggr ($c,$b) != stat truth $truth")
      }
    }

    val props = Map(
      Snapshots.checkpointFormatProp -> "auto",
      "graft.checkpoint.autoThreshold" -> "12",
      Snapshots.checkpointSidecarsProp -> "true",
      "graft.checkpoint.sidecar.spillRows" -> "8",
      "graft.partitionBy" -> "month")
    Snapshots.init(spark, root, mk(1L to 20L, 0).repartition(2), props)
    mirror ++= (1L to 20L).map(k => (k, k * 2.0, 0))
    check("init")
    (1 to 11).foreach { b =>
      val ks = (b * 100L + 1) to (b * 100L + 20)
      Snapshots.append(spark, root, mk(ks, b % 6).repartition(2))
      mirror ++= ks.map(k => (k, k * 2.0, b % 6))
    }                                                     // v1..v11
    check("ingest")
    // auto really flipped: the v0 checkpoint is TEXT (2 files < 12),
    // the v10 one PARQUET (a sidecar manifest)
    val lfs = new org.apache.hadoop.fs.Path(root + "/_log")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names0 = lfs.listStatus(new org.apache.hadoop.fs.Path(root + "/_log"))
      .map(_.getPath.getName).toSeq
    assert(names0.contains("v00000000.checkpoint"), "v0 must be text (auto)")
    assert(names0.contains("v00000010.checkpoint.parquet"),
      "v10 must be parquet (auto crossed the threshold)")
    assert(lfs.exists(new org.apache.hadoop.fs.Path(root + "/_log/_sidecars")),
      "the parquet checkpoint must be a sidecar manifest")

    Snapshots.deleteWhere(spark, root, "month = 2 AND k % 2 = 0") // v12
    mirror = mirror.filterNot(r => r._3 == 2 && r._1 % 2 == 0)
    check("cow-delete")
    Snapshots.updateWhere(spark, root, Map("v" -> "v + 0.25"), "month = 3") // v13
    mirror = mirror.map(r => if (r._3 == 3) (r._1, r._2 + 0.25, r._3) else r)
    check("cow-update")
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30) // v14: wide rewrite
    check("optimize")
    val preRestore = Snapshots.latestVersion(spark, root)
    val preMirror = mirror
    Snapshots.append(spark, root, mk(Seq(777777L), 1))    // v15
    mirror += ((777777L, 777777L * 2.0, 1))
    check("pre-restore")
    Snapshots.restore(spark, root, preRestore)            // v16: re-adds
    mirror = preMirror
    check("restore")
    (1 to 6).foreach { b =>
      val ks = (2000L + b * 10L) to (2000L + b * 10L + 4)
      Snapshots.append(spark, root, mk(ks, b % 6).coalesce(1))
      mirror ++= ks.map(k => (k, k * 2.0, b % 6))
    }                                                     // crosses v20
    check("post-boundary")
    val head0 = Snapshots.latestVersion(spark, root)
    Snapshots.vacuum(spark, root, keepFrom = head0 - 2)
    check("vacuum")

    // ---- exit ramp: sidecars off (the r17 auto-sidecar flip must be
    // DISARMED too — while armed, any later commit could legally flip
    // back, so DROP FEATURE refuses) → plain parquet boundary → vacuum
    // → DROP FEATURE → text → DROP parquetCheckpoint
    Snapshots.setProperties(spark, root,
      Map("graft.checkpoint.auto.sidecarsAt" -> "-1"),
      unset = Seq(Snapshots.checkpointSidecarsProp))
    val at = Snapshots.latestVersion(spark, root)
    ((at + 1) to (at / 10 * 10 + 10)).foreach { i =>
      Snapshots.append(spark, root, mk(Seq(3000L + i), 4).coalesce(1))
      mirror += ((3000L + i, (3000L + i) * 2.0, 4))
    }
    check("post-flip")
    Snapshots.vacuum(spark, root, Snapshots.latestVersion(spark, root))
    val dropV = Snapshots.dropFeature(spark, root, "checkpointSidecars")
    Snapshots.vacuum(spark, root, dropV)
    check("sidecars-dropped")
    val scDir2 = new org.apache.hadoop.fs.Path(s"$root/_log/_sidecars")
    assert(!lfs.exists(scDir2) || lfs.listStatus(scDir2).isEmpty,
      "no sidecar debris after the exit ramp")
    Snapshots.setProperties(spark, root,
      Map(Snapshots.checkpointFormatProp -> "text"))
    val at2 = Snapshots.latestVersion(spark, root)
    ((at2 + 1) to (at2 / 10 * 10 + 10)).foreach { i =>
      Snapshots.append(spark, root, mk(Seq(4000L + i), 5).coalesce(1))
      mirror += ((4000L + i, (4000L + i) * 2.0, 5))
    }
    Snapshots.vacuum(spark, root, Snapshots.latestVersion(spark, root))
    Snapshots.dropFeature(spark, root, "parquetCheckpoint")
    check("full-exit")
  }
}
