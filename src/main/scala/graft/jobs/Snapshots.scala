package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet table: a minimal copy-on-write transaction
  * log giving plain parquet the two properties the lifecycle operators'
  * scaladocs keep caveating away — TIME TRAVEL and isolation of readers
  * from in-flight rewrites.
  *
  * Layout (v2 — O(change) metadata):
  *   root/_log/v00000042.commit      one DELTA per version: header lines
  *                                   (`#txn:<id>` ties a streaming batch to
  *                                   its commit), then `+rel/path` adds and
  *                                   `-rel/path` removes. The delta rename
  *                                   is the atomic commit point — readers
  *                                   only see files a committed version
  *                                   references. Commit metadata is
  *                                   O(files CHANGED), never O(table) —
  *                                   the property a millions-of-files
  *                                   table needs (a full-file-list
  *                                   manifest per commit would write the
  *                                   whole listing on every append).
  *   root/_log/v00000040.checkpoint  full file list every `checkpointEvery`
  *                                   commits (and at the vacuum floor), so
  *                                   reconstructing any version replays at
  *                                   most `checkpointEvery` deltas from the
  *                                   nearest checkpoint at-or-below it.
  *                                   Checkpoints are DERIVED data — losing
  *                                   one only lengthens the replay.
  *   root/data/commit-42-ab12cd34/…  every commit writes NEW files into its
  *                                   own uniquely-suffixed directory;
  *                                   existing files are never modified or
  *                                   deleted by a commit (the suffix lets
  *                                   two optimistic appenders write
  *                                   side-by-side before racing on the
  *                                   delta rename).
  *   root/_changes/v00000042/…       the row-level change feed of a commit
  *                                   that opted in (`mergeCow(changeFeed =
  *                                   true)`) — the Delta-CDF shape
  *                                   `changesBetween` replays.
  *
  * Concurrency: the delta publish is an ATOMIC no-replace claim (hard
  * link on `file:`, no-replace rename on HDFS-like filesystems — see
  * `writeDelta`), so a lost commit race is a loud failure instead of
  * silent history corruption — and a
  * PURE APPEND (adds only) is automatically REBASED onto the winner and
  * retried, because appends commute: two interleaved appenders both land,
  * versions stay linear. COW rewrites (delete/merge/optimize) never
  * auto-rebase — their removed-file set was computed against a snapshot the
  * winner may have invalidated, so they keep the loud failure.
  *
  * Exactly-once streaming: a streaming commit records its batch id IN the
  * delta itself (`#txn:`), so the commit and the batch bookkeeping are one
  * atomic rename — there is no marker file that can lag the manifest and
  * re-admit a crash-replayed batch (`lastCommittedBatch` reads the ids
  * back from the committed deltas).
  *
  * Scale shape: a commit's cost is the changed files, never the table;
  * readers plan from an explicit file list reconstructed from one
  * checkpoint plus at most `checkpointEvery` deltas, so there is no
  * directory listing on the hot path at all (the listing problem a 100 TB
  * table's object store makes expensive). */
object Snapshots {

  /** Commits between full checkpoint manifests — the replay bound. */
  private val checkpointEvery = 10L
  private val maxCommitRetries = 50

  /** One commit's metadata: paths added, paths removed (both
    * root-relative), and the streaming batch id when the commit came from
    * `commitStreamingBatch`. */
  final case class Delta(adds: Seq[String], removes: Seq[String], txn: Option[Long] = None)

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  private def deltaPath(root: Path, v: Long) =
    new Path(root, f"_log/v$v%08d.commit")
  private def checkpointPath(root: Path, v: Long) =
    new Path(root, f"_log/v$v%08d.checkpoint")
  private def changesPath(root: Path, v: Long) =
    new Path(root, f"_changes/v$v%08d")

  private def logVersions(spark: SparkSession, root: String, suffix: String): Seq[Long] = {
    val (fs, qroot) = fsOf(spark, root)
    val log = new Path(qroot, "_log")
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(suffix))
      .map(n => n.stripPrefix("v").stripSuffix(suffix).toLong)
      .sorted
  }

  /** Versions present in the log, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    logVersions(spark, root, ".commit")

  private def checkpointVersions(spark: SparkSession, root: String): Seq[Long] =
    logVersions(spark, root, ".checkpoint")

  def latestVersion(spark: SparkSession, root: String): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no snapshot log at $root")
    vs.last
  }

  private def readLines(spark: SparkSession, root: String, p: Path): Seq[String] = {
    val (fs, _) = fsOf(spark, root)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  private[jobs] def readDelta(spark: SparkSession, root: String, v: Long): Delta = {
    val (_, qroot) = fsOf(spark, root)
    val lines = readLines(spark, root, deltaPath(qroot, v))
    Delta(
      adds = lines.filter(_.startsWith("+")).map(_.substring(1)),
      removes = lines.filter(_.startsWith("-")).map(_.substring(1)),
      txn = lines.find(_.startsWith("#txn:")).map(_.stripPrefix("#txn:").toLong))
  }

  /** Publish version `v`'s delta atomically: write a tmp file, then
    * claim the destination with an ATOMIC no-replace publish, so readers
    * never see a partial file AND two racing writers can never both
    * think they won.
    *
    * The publish primitive is filesystem-specific because POSIX rename
    * REPLACES an existing destination — a bare exists-check + rename has
    * a window where two writers both pass the check and the second
    * SILENTLY overwrites the first (a lost commit, the one corruption a
    * log must never allow). On `file:` schemes a HARD LINK is the atomic
    * no-replace primitive (link(2) fails with EEXIST); on HDFS-like
    * filesystems `rename` itself refuses an existing destination
    * atomically. Either way a lost race surfaces as the loud
    * "commit race" failure `commitAdds` rebases on. */
  private[jobs] def writeDelta(spark: SparkSession, root: String, v: Long, d: Delta): Unit = {
    val (fs, qroot) = fsOf(spark, root)
    val dest = deltaPath(qroot, v)
    val tmp = new Path(qroot,
      f"_log/.v$v%08d-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val lines =
      d.txn.map(b => s"#txn:$b").toSeq ++
        d.adds.sorted.map("+" + _) ++ d.removes.sorted.map("-" + _)
    val out = fs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    def lose(): Nothing = {
      fs.delete(tmp, false)
      throw new IllegalArgumentException(
        s"commit race: version $v already exists at $root")
    }
    if ("file" == dest.toUri.getScheme) {
      val destFile = java.nio.file.Paths.get(dest.toUri)
      val tmpFile = java.nio.file.Paths.get(tmp.toUri)
      try java.nio.file.Files.createLink(destFile, tmpFile)
      catch { case _: java.nio.file.FileAlreadyExistsException => lose() }
      fs.delete(tmp, false)
    } else {
      if (fs.exists(dest)) lose()
      if (!fs.rename(tmp, dest)) lose()
    }
  }

  /** Checkpoints are derived (a pure function of the deltas), so the write
    * is overwrite-tolerant — no race can corrupt history through one. */
  private def writeCheckpoint(
      spark: SparkSession, root: String, v: Long, files: Seq[String]): Unit = {
    val (fs, qroot) = fsOf(spark, root)
    val tmp = new Path(qroot,
      f"_log/.v$v%08d-ckpt-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = checkpointPath(qroot, v)
    fs.delete(dest, false)
    require(fs.rename(tmp, dest), s"failed to publish checkpoint $v at $root")
  }

  private def maybeCheckpoint(spark: SparkSession, root: String, v: Long): Unit =
    if (v % checkpointEvery == 0L)
      writeCheckpoint(spark, root, v, versionFileList(spark, root, v))

  /** Version `v`'s root-relative file list: nearest checkpoint at-or-below
    * `v`, plus the (at most `checkpointEvery`) deltas after it — O(change
    * since checkpoint), never O(commits since birth). */
  private def versionFileList(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val (_, qroot) = fsOf(spark, root)
    val base = checkpointVersions(spark, root).filter(_ <= v).lastOption
    val initial: Seq[String] = base match {
      case Some(cv) => readLines(spark, root, checkpointPath(qroot, cv))
      case None => Seq.empty
    }
    val start = base.map(_ + 1).getOrElse(0L)
    var files = scala.collection.mutable.LinkedHashSet[String](initial: _*)
    (start to v).foreach { w =>
      val d = readDelta(spark, root, w)
      files ++= d.adds
      files --= d.removes
    }
    files.toSeq.sorted
  }

  /** A version's absolute data-file paths — the input a file-skipping
    * index build (core/Skipping) or any external reader needs; the log IS
    * the listing. */
  def versionFiles(spark: SparkSession, root: String, version: Long = -1L): Seq[String] = {
    val v = if (version < 0) latestVersion(spark, root) else version
    val (_, qroot) = fsOf(spark, root)
    versionFileList(spark, root, v).map(f => new Path(qroot, f).toString)
  }

  /** Read a specific version (default: latest). Plans from the log's
    * explicit file list — no directory listing. */
  def readVersion(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, root) else version
    val files = versionFiles(spark, root, v)
    require(files.nonEmpty, s"version $v of $root is empty")
    spark.read.parquet(files: _*)
  }

  /** Write `df` into a fresh uniquely-suffixed commit dir, returning the
    * new files' root-relative paths. The suffix keeps two optimistic
    * appenders' data writes from colliding before the delta-rename race
    * decides their versions. */
  private def writeCommitFiles(
      spark: SparkSession, root: String, v: Long, df: DataFrame): Seq[String] = {
    val (fs, qroot) = fsOf(spark, root)
    val dir = new Path(qroot,
      s"data/commit-$v-${java.util.UUID.randomUUID.toString.take(8)}")
    df.write.parquet(dir.toString)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s"data/${dir.getName}/${s.getPath.getName}")
  }

  /** Create version 0 from `df`. Fails if a log already exists. */
  def init(spark: SparkSession, root: String, df: DataFrame): Long =
    initTxn(spark, root, df, None)

  private def initTxn(
      spark: SparkSession, root: String, df: DataFrame, txn: Option[Long]): Long = {
    require(versions(spark, root).isEmpty, s"snapshot log already exists at $root")
    writeDelta(spark, root, 0L, Delta(writeCommitFiles(spark, root, 0L, df), Nil, txn))
    maybeCheckpoint(spark, root, 0L)
    0L
  }

  /** New version = previous files plus `df` as new files. Retries with a
    * rebase on a lost commit race (appends commute — see `commitAdds`). */
  def append(spark: SparkSession, root: String, df: DataFrame): Long =
    appendTxn(spark, root, df, None)

  private def appendTxn(
      spark: SparkSession, root: String, df: DataFrame, txn: Option[Long]): Long = {
    val base = latestVersion(spark, root)
    commitAdds(spark, root, writeCommitFiles(spark, root, base + 1, df), txn, base + 1)
  }

  /** Optimistic-concurrency commit of a PURE APPEND: attempt `startV`; on a
    * lost race, re-read the latest version and retry one higher. Safe
    * because an append's delta references only its own new files — it
    * commutes with any interleaved commit, so rebasing is just renumbering.
    * Exposed for the spec to exercise the collision branch
    * deterministically. */
  private[jobs] def commitAdds(
      spark: SparkSession, root: String, adds: Seq[String],
      txn: Option[Long], startV: Long): Long = {
    var v = startV
    var attempts = 0
    var committed = false
    while (!committed) {
      try {
        writeDelta(spark, root, v, Delta(adds, Nil, txn))
        committed = true
      } catch {
        case e: IllegalArgumentException if e.getMessage.contains("commit race") =>
          attempts += 1
          if (attempts >= maxCommitRetries)
            throw new IllegalStateException(
              s"append lost $maxCommitRetries commit races at $root — writer storm?", e)
          v = math.max(v + 1, latestVersion(spark, root) + 1)
      }
    }
    maybeCheckpoint(spark, root, v)
    v
  }

  /** A COW rewrite commit (removes + adds computed against `prev`): no
    * auto-rebase — a lost race means the removed-file set may be stale, so
    * it fails loudly (the single-writer contract for rewrites). */
  private def commitRewrite(
      spark: SparkSession, root: String, v: Long, d: Delta): Long = {
    writeDelta(spark, root, v, d)
    maybeCheckpoint(spark, root, v)
    v
  }

  /** File-granular copy-on-write delete: rewrite ONLY the files holding a
    * doomed key; every other file carries over by reference. With
    * `changeFeed = true` the commit publishes its `_op = delete` rows
    * under `_changes/` (computed against the pre-delete version), so a
    * log whose writers opt in carries a complete CRUD feed for
    * `changesBetween`. */
  def deleteKeysCow(
      spark: SparkSession, root: String, keys: DataFrame, keyCols: Seq[String],
      changeFeed: Boolean = false): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    val (_, qroot) = fsOf(spark, root)
    val prevFiles = versionFileList(spark, root, prev)
    val current = readVersion(spark, root, prev)
      .withColumn("__file", input_file_name())
    val keySet = keys.select(keyCols.map(col): _*).dropDuplicates(keyCols)
    if (changeFeed) {
      ChangeFeed.deleteFeed(readVersion(spark, root, prev), keySet, keyCols)
        .write.mode("overwrite").parquet(changesPath(qroot, v).toString)
    }
    // input_file_name() yields URI spellings (file:///x) that differ from
    // Path.toString (file:/x) — normalize through Path before comparing
    val doomedFiles = current.join(keySet, keyCols, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => new Path(r.getString(0)).toString).toSet
    if (doomedFiles.isEmpty) {
      return commitRewrite(spark, root, v, Delta(Nil, Nil))
    }
    val rewritten = prevFiles.filter(f => doomedFiles.contains(new Path(qroot, f).toString))
    // EVERY doomed path must resolve to a manifest entry: a partial
    // resolution means path spellings diverged and unmatched files would
    // silently keep their doomed rows
    require(rewritten.size == doomedFiles.size,
      s"${doomedFiles.size} files hold doomed keys but only ${rewritten.size} " +
        s"resolved to log entries — path normalization bug? $doomedFiles")
    val kept = spark.read
      .parquet(rewritten.map(f => new Path(qroot, f).toString): _*)
      .join(keySet, keyCols, "left_anti")
    val newFiles = writeCommitFiles(spark, root, v, kept)
    commitRewrite(spark, root, v, Delta(newFiles, rewritten))
  }

  /** Copy-on-write MERGE (whole-row update-else-insert, the Merge
    * semantics): files holding a MATCHED key are rewritten without those
    * rows, and one commit's worth of new files carries the full source
    * batch; everything else carries over by reference. History intact —
    * the pre-merge version still reads exactly.
    *
    * With `changeFeed = true` the commit also publishes its row-level
    * change set (jobs/ChangeFeed semantics: insert / update_preimage /
    * update_postimage) under `_changes/`, computed against the PRE-merge
    * version — the Delta-CDF shape `changesBetween` replays. */
  def mergeCow(
      spark: SparkSession, root: String, source: DataFrame, keyCols: Seq[String],
      changeFeed: Boolean = false): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    val (_, qroot) = fsOf(spark, root)
    val prevFiles = versionFileList(spark, root, prev)
    val src = source.dropDuplicates(keyCols)
    val srcKeys = src.select(keyCols.map(col): _*)
    val current = readVersion(spark, root, prev).withColumn("__file", input_file_name())
    val matchedFiles = current.join(srcKeys, keyCols, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => new Path(r.getString(0)).toString).toSet
    val rewritten = prevFiles.filter(f => matchedFiles.contains(new Path(qroot, f).toString))
    // same full-resolution guard as deleteKeysCow: a partial match means
    // matched rows would survive in carried-over files AND re-enter via the
    // appended source — silent duplicate keys
    require(rewritten.size == matchedFiles.size,
      s"${matchedFiles.size} files hold matched keys but only ${rewritten.size} " +
        s"resolved to log entries — path normalization bug? $matchedFiles")
    val schemaCols = readVersion(spark, root, prev).columns.map(col).toSeq
    if (changeFeed) {
      ChangeFeed.mergeFeed(readVersion(spark, root, prev), src, keyCols)
        .write.mode("overwrite").parquet(changesPath(qroot, v).toString)
    }
    val kept =
      if (rewritten.isEmpty) src.select(schemaCols: _*)
      else spark.read.parquet(rewritten.map(f => new Path(qroot, f).toString): _*)
        .join(srcKeys, keyCols, "left_anti")
        .select(schemaCols: _*)
        .unionByName(src.select(schemaCols: _*))
    val newFiles = writeCommitFiles(spark, root, v, kept)
    commitRewrite(spark, root, v, Delta(newFiles, rewritten))
  }

  /** The change feed of versions (`fromV`, `toV`] — every commit in the
    * range must have published one (`mergeCow(changeFeed = true)`). The
    * CDC read path of the unified table API. */
  def changesBetween(
      spark: SparkSession, root: String, fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"empty change range ($fromV, $toV]")
    val (fs, qroot) = fsOf(spark, root)
    val dirs = ((fromV + 1) to toV).map { v =>
      val p = changesPath(qroot, v)
      require(fs.exists(p),
        s"version $v of $root has no change feed — commit with changeFeed = true")
      p.toString
    }
    spark.read.parquet(dirs: _*)
  }

  /** OPTIMIZE as a commit: rewrite the CURRENT version into `numFiles`
    * files clustered by `clusterBy` (range-partitioned + sorted, so
    * min/max file skipping works afterwards — pair with core/Skipping).
    * Prior versions keep reading their own files. */
  def optimizeCow(
      spark: SparkSession, root: String, clusterBy: Seq[String], numFiles: Int): Long = {
    val prev = latestVersion(spark, root)
    val clustered = readVersion(spark, root, prev)
      .repartitionByRange(numFiles, clusterBy.map(col): _*)
      .sortWithinPartitions(clusterBy.map(col): _*)
    commitOptimized(spark, root, prev, clustered)
  }

  /** OPTIMIZE ZORDER BY as a commit: rewrite the current version laid out
    * by explicit Morton cell over TWO integral columns, so min/max file
    * skipping prunes range predicates on EITHER dimension afterwards
    * (each file covers a union of small axis-aligned rectangles of the
    * (a, b) domain — contrast `optimizeCow`, which prunes only its leading
    * cluster key). `cellDiv` sets the cell grain: with b-bit column
    * domains, `2^(2b-4)` yields a 4×4 grid of 16 cells. Explicit cells —
    * never sampled range boundaries — keep file envelopes deterministic. */
  def optimizeZorderCow(
      spark: SparkSession, root: String, colA: String, colB: String,
      cellDiv: Long = 4096L, numFiles: Int = 16): Long = {
    val prev = latestVersion(spark, root)
    val cur = readVersion(spark, root, prev)
    val clustered = cur
      .withColumn("__zcell",
        graft.functions.ZOrder.interleave16(col(colA), col(colB))
          .divide(lit(cellDiv)).cast("long"))
      .repartition(numFiles, col("__zcell"))
      .sortWithinPartitions(col("__zcell"), col(colA), col(colB))
      .drop("__zcell")
    commitOptimized(spark, root, prev, clustered)
  }

  private def commitOptimized(
      spark: SparkSession, root: String, prev: Long, clustered: DataFrame): Long = {
    val v = prev + 1
    val prevFiles = versionFileList(spark, root, prev)
    val newFiles = writeCommitFiles(spark, root, v, clustered)
    commitRewrite(spark, root, v, Delta(newFiles, prevFiles))
  }

  /** Highest streaming batch id recorded in any committed delta (see
    * `commitStreamingBatch`), or -1. Reads the log newest-first and stops
    * at the first `#txn:` header — on a streaming-ingested table that is
    * the latest commit, so this is O(1) log reads, not O(history). */
  def lastCommittedBatch(spark: SparkSession, root: String): Long = {
    versions(spark, root).reverseIterator
      .map(v => readDelta(spark, root, v).txn)
      .collectFirst { case Some(b) => b }
      .getOrElse(-1L)
  }

  /** Idempotent streaming append: commit `batch` as a new version unless
    * this `batchId` already committed (a foreachBatch re-run after a crash
    * between sink commit and checkpoint advance re-delivers the same
    * batch). The batch id travels INSIDE the version's delta, so the data
    * commit and the batch bookkeeping are one atomic rename — a crash
    * anywhere leaves either no trace (replay re-runs cleanly) or a
    * committed delta whose `#txn:` header makes the replay a recognized
    * no-op. No marker file, no window where the two disagree. */
  def commitStreamingBatch(
      spark: SparkSession, root: String, batch: DataFrame, batchId: Long): Boolean = {
    if (batchId <= lastCommittedBatch(spark, root)) return false
    if (versions(spark, root).isEmpty) initTxn(spark, root, batch, Some(batchId))
    else appendTxn(spark, root, batch, Some(batchId))
    true
  }

  /** Drop versions < `keepFrom` and physically delete every file no
    * retained version references. A checkpoint is materialized at the new
    * history floor first, so no retained version ever needs a dropped
    * delta to reconstruct. After this, time travel reaches back only to
    * `keepFrom`. Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, root: String, keepFrom: Long): Int = {
    val (fs, qroot) = fsOf(spark, root)
    val all = versions(spark, root)
    val (drop, keep) = all.partition(_ < keepFrom)
    require(keep.nonEmpty, s"vacuum would drop every version of $root")
    val floor = keep.min
    writeCheckpoint(spark, root, floor, versionFileList(spark, root, floor))
    val referenced = keep.flatMap(v => versionFileList(spark, root, v)).toSet
    val orphans = drop.flatMap(v => versionFileList(spark, root, v)).distinct
      .filterNot(referenced.contains)
    orphans.foreach(f => fs.delete(new Path(qroot, f), false))
    drop.foreach { v =>
      fs.delete(deltaPath(qroot, v), false)
      fs.delete(changesPath(qroot, v), true)
    }
    checkpointVersions(spark, root).filter(_ < floor)
      .foreach(v => fs.delete(checkpointPath(qroot, v), false))
    orphans.size
  }

  /** Reclaim UNCOMMITTED debris: tmp manifests from crashed delta writes
    * and data files no version references (a writer that died between
    * `writeCommitFiles` and its delta rename, or an OCC loser that never
    * retried). Only debris older than `olderThanMs` is touched — an
    * IN-FLIGHT writer's staged files look identical to a dead one's, so
    * the age gate is the safety margin (same contract as a table
    * format's tombstone retention; pick it ≫ the longest running
    * commit). Committed history is never touched — this is the
    * complement of `vacuum`, which reclaims files of DROPPED versions. */
  def vacuumDebris(spark: SparkSession, root: String, olderThanMs: Long): Int = {
    val (fs, qroot) = fsOf(spark, root)
    val cutoff = System.currentTimeMillis() - olderThanMs
    var removed = 0
    val log = new Path(qroot, "_log")
    if (fs.exists(log)) fs.listStatus(log).foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith(".") &&
          s.getPath.getName.endsWith(".tmp") && s.getModificationTime < cutoff) {
        fs.delete(s.getPath, false); removed += 1
      }
    }
    val referenced = versions(spark, root)
      .flatMap(v => versionFileList(spark, root, v)).toSet
    // whole-commit-dir granularity: a committed dir has referenced data
    // files and is never touched; an uncommitted dir (no file referenced
    // by ANY version) goes entirely once every file in it is old enough
    val data = new Path(qroot, "data")
    if (fs.exists(data)) fs.listStatus(data).filter(_.isDirectory).foreach { dir =>
      val files = fs.listStatus(dir.getPath).toSeq
      val anyReferenced = files.exists(f =>
        referenced.contains(s"data/${dir.getPath.getName}/${f.getPath.getName}"))
      if (!anyReferenced && files.nonEmpty && files.forall(_.getModificationTime < cutoff)) {
        removed += files.count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        fs.delete(dir.getPath, true)
      }
    }
    removed
  }

  /** The unified table-read entry point: one call site for time travel
    * (`versionAsOf`), CDC replay (`changesBetween`) and stats-pruned scans
    * (`pruneOn`) — what a user reaches for instead of wiring
    * `readVersion` / `changesBetween` / `Skipping` by hand. */
  def table(spark: SparkSession, root: String): SnapshotReader =
    new SnapshotReader(spark, root)

  /** Builder for `Snapshots.table`. `pruneOn` consults footer statistics
    * over the version's EXPLICIT file list (executor-distributed reads —
    * core/Skipping.buildIndexDistributed), so the pruned scan never lists
    * a directory and never reads a data page of a skipped file. */
  final class SnapshotReader private[jobs] (spark: SparkSession, root: String) {
    private var versionOpt: Option[Long] = None
    private var changesOpt: Option[(Long, Long)] = None
    private var pruneOpt: Option[(String, Long, Long)] = None

    def versionAsOf(v: Long): SnapshotReader = { versionOpt = Some(v); this }
    def changesBetween(fromV: Long, toV: Long): SnapshotReader = {
      changesOpt = Some((fromV, toV)); this
    }
    def pruneOn(colName: String, lo: Long, hi: Long): SnapshotReader = {
      pruneOpt = Some((colName, lo, hi)); this
    }

    def load(): DataFrame = changesOpt match {
      case Some((a, b)) =>
        require(versionOpt.isEmpty && pruneOpt.isEmpty,
          "changesBetween cannot combine with versionAsOf/pruneOn")
        Snapshots.changesBetween(spark, root, a, b)
      case None =>
        val v = versionOpt.getOrElse(latestVersion(spark, root))
        pruneOpt match {
          case Some((c, lo, hi)) =>
            val idx = graft.core.Skipping.buildIndexDistributed(
              spark, versionFiles(spark, root, v))
            graft.core.Skipping.scanPruned(spark, idx, c, lo, hi)
          case None => readVersion(spark, root, v)
        }
    }
  }
}
