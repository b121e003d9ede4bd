package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental downstream materialization over the snapshot log — the
  * micro-batch "streaming source" shape a table format owes its
  * consumers (Delta's streaming source / Iceberg's incremental read):
  * each sync reads ONLY the files appended to the source table since the
  * last sync and commits the transformed batch to a DESTINATION snapshot
  * table, exactly-once.
  *
  * The watermark is not a side file: the destination commit carries
  * `#txn:<source version>` (Snapshots.commitStreamingBatch), so "how far
  * did I get" and "the data that got there" are one atomic rename —
  * a crash between them is impossible by construction, and a replayed
  * sync is recognized as a no-op from the destination log alone
  * (`lastCommittedBatch`, bounded by checkpoint `#maxtxn:` headers).
  *
  * Rewrite commits (deletes / merges / OPTIMIZE — any delta with
  * removes) are NOT append-shaped; tailing their adds would double-count
  * carried rows. Mirroring Delta's streaming-source contract: they fail
  * loudly by default, or are skipped wholesale with
  * `skipRewrites = true` (the `skipChangeCommits` admission — downstream
  * sees inserts only). A rewrite-aware consumer should replay the
  * change feed instead (`Snapshots.changesBetween` — the CDC path).
  *
  * 100 TB shape: a sync's cost is O(files appended since the watermark)
  * — the log names them outright (no directory diffing, no listing), and
  * the destination commit is O(batch). A busy ingest table tails in
  * seconds regardless of table size.
  */
object TableSync {

  /** What one sync did: the source version the destination is now caught
    * up to, how many source versions and appended files the batch
    * consumed, and whether a destination commit happened at all (false =
    * already caught up, or every new version was a skipped rewrite). */
  final case class SyncResult(
      srcVersion: Long, versionsConsumed: Int, filesRead: Int, committed: Boolean)

  /** The appended files of source versions (fromV, toV], as one batch
    * DataFrame under the source HEAD schema (evolution null-fills older
    * files). OPTIMIZE commits are skipped automatically — same rows,
    * different files, so tailing their adds would double-count and
    * skipping them loses nothing. Other rewrites (merge/delete) throw
    * unless `skipRewrites`. */
  /** The files appended by each source version in (fromV, toV], ascending,
    * as fully-qualified paths. OPTIMIZE commits contribute nothing (same
    * rows, different files); other rewrites throw unless `skipRewrites`.
    * This is the shared tail primitive: `appendsBetween` batches it, and
    * the `readStream` front door (sources/SnapshotStreamSource) paces
    * micro-batches over it. */
  def appendedFilesPerVersion(
      spark: SparkSession, srcRoot: String, fromV: Long, toV: Long,
      skipRewrites: Boolean = false): Seq[(Long, Seq[String])] =
    ((fromV + 1) to toV).map(v =>
      v -> appendedFilesOfVersion(spark, srcRoot, v, skipRewrites))

  /** The files appended by ONE source version (fully-qualified) — the
    * single-delta-read grain a paced streaming source needs: admission
    * control can stop calling the moment a version is not admitted,
    * paying O(versions admitted + 1) metadata reads per trigger instead
    * of sweeping the whole backlog. */
  def appendedFilesOfVersion(
      spark: SparkSession, srcRoot: String, v: Long,
      skipRewrites: Boolean = false): Seq[String] = {
    val qroot = {
      val p = new Path(srcRoot)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
    }
    val d = Snapshots.readDelta(spark, srcRoot, v)
    if (d.op.contains("optimize")) Nil // logical no-op: rows unchanged
    else if (d.removes.nonEmpty || d.dvAdd.isDefined) {
      // a deletion-vector commit changes rows without touching files —
      // exactly as un-tailable as a COW rewrite
      if (!skipRewrites) throw new IllegalStateException(
        s"version $v of $srcRoot is a rewrite (removes or deletion vector) — " +
          "appends-only tailing would miss or double-count rows; pass " +
          "skipRewrites = true to skip rewrite commits, or consume the " +
          "change feed (changesBetween)")
      Nil
    } else d.adds.map(f => new Path(qroot, f).toString)
  }

  def appendsBetween(
      spark: SparkSession, srcRoot: String, fromV: Long, toV: Long,
      skipRewrites: Boolean = false): (DataFrame, Int) = {
    val files =
      appendedFilesPerVersion(spark, srcRoot, fromV, toV, skipRewrites).flatMap(_._2)
    val df =
      if (files.isEmpty) None
      else {
        // the shared file-read primitive handles partition-value
        // recovery from paths AND column mapping (renamed columns'
        // physical names) in one place
        val qroot = {
          val p = new Path(srcRoot)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
        }
        Some(Snapshots.readFilesAs(spark, qroot, files,
          Snapshots.versionSchema(spark, srcRoot, toV),
          Snapshots.tableProperties(spark, srcRoot, toV)))
      }
    (df.getOrElse(Snapshots.readVersion(spark, srcRoot, toV).limit(0)), files.size)
  }

  /** One incremental sync step: tail the source's new appends past the
    * destination's recorded watermark, apply `transform`, commit to the
    * destination tagged `#txn:<source head version>`. Idempotent —
    * re-running after any crash either recognizes the already-committed
    * batch (no-op) or redoes exactly the lost work. */
  def syncIncremental(
      spark: SparkSession, srcRoot: String, dstRoot: String,
      transform: DataFrame => DataFrame = identity,
      skipRewrites: Boolean = false): SyncResult = {
    val srcHead = Snapshots.latestVersion(spark, srcRoot)
    val watermark = Snapshots.lastCommittedBatch(spark, dstRoot)
    if (watermark >= srcHead)
      return SyncResult(watermark, 0, 0, committed = false)
    val (batch, nFiles) =
      appendsBetween(spark, srcRoot, watermark, srcHead, skipRewrites)
    if (nFiles == 0) {
      // nothing appended (all-rewrite range): advance the watermark with
      // an empty commit so the skipped range is never re-examined
      val committed = Snapshots.commitStreamingBatch(
        spark, dstRoot, transform(batch), batchId = srcHead)
      return SyncResult(srcHead, (srcHead - watermark).toInt, 0, committed)
    }
    val committed = Snapshots.commitStreamingBatch(
      spark, dstRoot, transform(batch), batchId = srcHead)
    SyncResult(srcHead, (srcHead - watermark).toInt, nFiles, committed)
  }
}
