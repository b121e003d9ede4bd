package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet table: a minimal copy-on-write transaction
  * log giving plain parquet the two properties the lifecycle operators'
  * scaladocs keep caveating away — TIME TRAVEL and isolation of readers
  * from in-flight rewrites.
  *
  * Layout:
  *   root/_log/v00000042.list   one manifest per version: the version's
  *                              complete file list, one relative path per
  *                              line (manifest write is the atomic commit
  *                              point — readers only see files a manifest
  *                              references)
  *   root/data/commit-42/...    every commit writes NEW files into its own
  *                              directory; existing files are never
  *                              modified or deleted by a commit
  *
  * Operations:
  *   - append: new files + manifest = previous ∪ new.
  *   - deleteKeysCow: FILE-granular copy-on-write — the files that hold a
  *     doomed key are found by semi-joining on `input_file_name()` (one
  *     pruned scan), ONLY those files are rewritten without the doomed
  *     rows; untouched files carry over by reference. Finer than the
  *     partition-granular `Lifecycle.deleteKeys`.
  *   - readVersion: any historical version stays readable until `vacuum`
  *     drops files no retained manifest references.
  *
  * Scale shape: a commit's cost is the changed files, never the table;
  * manifests are O(files) text the driver can stream; readers plan from
  * an explicit file list, so there is no directory listing on the hot
  * path at all (the listing problem a 100 TB table's object store makes
  * expensive). Single-writer by design — serializing writers (the
  * foreachBatch pattern, or a lock service) is the deployment's job;
  * what the log guarantees is that READERS are never torn. */
object Snapshots {

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  private def manifestPath(root: Path, v: Long) =
    new Path(root, f"_log/v$v%08d.list")

  /** Versions present in the log, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, qroot) = fsOf(spark, root)
    val log = new Path(qroot, "_log")
    if (!fs.exists(log)) Seq.empty
    else fs.listStatus(log).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".list"))
      .map(n => n.stripPrefix("v").stripSuffix(".list").toLong)
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no snapshot log at $root")
    vs.last
  }

  private def readManifest(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val (fs, qroot) = fsOf(spark, root)
    val in = fs.open(manifestPath(qroot, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  private[jobs] def writeManifest(spark: SparkSession, root: String, v: Long, files: Seq[String]): Unit = {
    val (fs, qroot) = fsOf(spark, root)
    // write-then-rename: the rename publishes the manifest atomically
    // (readers never see a partial file). POSIX rename REPLACES an
    // existing destination, so losing a race must be detected explicitly;
    // true multi-writer mutual exclusion is an external concern (the
    // scaladoc's single-writer contract) — this check turns a lost race
    // into a loud failure instead of silent history corruption.
    val dest = manifestPath(qroot, v)
    val tmp = new Path(qroot, f"_log/.v$v%08d.tmp")
    val out = fs.create(tmp, false)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(dest)) {
      fs.delete(tmp, false)
      throw new IllegalArgumentException(
        s"commit race: version $v already exists at $root")
    }
    require(fs.rename(tmp, dest), s"commit race: version $v already exists at $root")
  }

  /** Write `df` into a fresh commit dir, returning the new files'
    * root-relative paths. */
  private def writeCommitFiles(
      spark: SparkSession, root: String, v: Long, df: DataFrame): Seq[String] = {
    val (fs, qroot) = fsOf(spark, root)
    val dir = new Path(qroot, s"data/commit-$v")
    df.write.parquet(dir.toString)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s"data/commit-$v/${s.getPath.getName}")
  }

  /** Create version 0 from `df`. Fails if a log already exists. */
  def init(spark: SparkSession, root: String, df: DataFrame): Long = {
    require(versions(spark, root).isEmpty, s"snapshot log already exists at $root")
    writeManifest(spark, root, 0L, writeCommitFiles(spark, root, 0L, df))
    0L
  }

  /** A version's absolute data-file paths — the input a file-skipping
    * index build (core/Skipping.buildIndexForFiles) or any external
    * reader needs; the manifest IS the listing. */
  def versionFiles(spark: SparkSession, root: String, version: Long = -1L): Seq[String] = {
    val v = if (version < 0) latestVersion(spark, root) else version
    val (_, qroot) = fsOf(spark, root)
    readManifest(spark, root, v).map(f => new Path(qroot, f).toString)
  }

  /** Read a specific version (default: latest). Plans from the manifest's
    * explicit file list — no directory listing. */
  def readVersion(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(spark, root) else version
    val (_, qroot) = fsOf(spark, root)
    val files = readManifest(spark, root, v).map(f => new Path(qroot, f).toString)
    require(files.nonEmpty, s"version $v of $root is empty")
    spark.read.parquet(files: _*)
  }

  /** New version = previous files plus `df` as new files. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    writeManifest(spark, root, v,
      readManifest(spark, root, prev) ++ writeCommitFiles(spark, root, v, df))
    v
  }

  /** File-granular copy-on-write delete: rewrite ONLY the files holding a
    * doomed key; every other file carries over by reference. */
  def deleteKeysCow(
      spark: SparkSession, root: String, keys: DataFrame, keyCols: Seq[String]): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    val (_, qroot) = fsOf(spark, root)
    val prevFiles = readManifest(spark, root, prev)
    val current = readVersion(spark, root, prev)
      .withColumn("__file", input_file_name())
    val keySet = keys.select(keyCols.map(col): _*).dropDuplicates(keyCols)
    // input_file_name() yields URI spellings (file:///x) that differ from
    // Path.toString (file:/x) — normalize through Path before comparing
    val doomedFiles = current.join(keySet, keyCols, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => new Path(r.getString(0)).toString).toSet
    if (doomedFiles.isEmpty) {
      writeManifest(spark, root, v, prevFiles); return v
    }
    val rewritten = prevFiles.filter(f => doomedFiles.contains(new Path(qroot, f).toString))
    require(rewritten.nonEmpty,
      s"doomed keys resolved to no manifest file — path normalization bug? $doomedFiles")
    val carried = prevFiles.filterNot(rewritten.contains)
    val kept = spark.read
      .parquet(rewritten.map(f => new Path(qroot, f).toString): _*)
      .join(keySet, keyCols, "left_anti")
    val newFiles = writeCommitFiles(spark, root, v, kept)
    writeManifest(spark, root, v, carried ++ newFiles)
    v
  }

  /** Copy-on-write MERGE (whole-row update-else-insert, the Merge
    * semantics): files holding a MATCHED key are rewritten without those
    * rows, and one commit's worth of new files carries the full source
    * batch; everything else carries over by reference. History intact —
    * the pre-merge version still reads exactly. */
  def mergeCow(
      spark: SparkSession, root: String, source: DataFrame, keyCols: Seq[String]): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    val (_, qroot) = fsOf(spark, root)
    val prevFiles = readManifest(spark, root, prev)
    val src = source.dropDuplicates(keyCols)
    val srcKeys = src.select(keyCols.map(col): _*)
    val current = readVersion(spark, root, prev).withColumn("__file", input_file_name())
    val matchedFiles = current.join(srcKeys, keyCols, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => new Path(r.getString(0)).toString).toSet
    val rewritten = prevFiles.filter(f => matchedFiles.contains(new Path(qroot, f).toString))
    val carried = prevFiles.filterNot(rewritten.contains)
    val schemaCols = readVersion(spark, root, prev).columns.map(col).toSeq
    val kept =
      if (rewritten.isEmpty) src.select(schemaCols: _*)
      else spark.read.parquet(rewritten.map(f => new Path(qroot, f).toString): _*)
        .join(srcKeys, keyCols, "left_anti")
        .select(schemaCols: _*)
        .unionByName(src.select(schemaCols: _*))
    val newFiles = writeCommitFiles(spark, root, v, kept)
    writeManifest(spark, root, v, carried ++ newFiles)
    v
  }

  /** OPTIMIZE as a commit: rewrite the CURRENT version into `numFiles`
    * files clustered by `clusterBy` (range-partitioned + sorted, so
    * min/max file skipping works afterwards — pair with core/Skipping).
    * Prior versions keep reading their own files. */
  def optimizeCow(
      spark: SparkSession, root: String, clusterBy: Seq[String], numFiles: Int): Long = {
    val prev = latestVersion(spark, root)
    val v = prev + 1
    val clustered = readVersion(spark, root, prev)
      .repartitionByRange(numFiles, clusterBy.map(col): _*)
      .sortWithinPartitions(clusterBy.map(col): _*)
    writeManifest(spark, root, v, writeCommitFiles(spark, root, v, clustered))
    v
  }

  /** Highest streaming batch id already committed (see
    * `commitStreamingBatch`), or -1. */
  def lastCommittedBatch(spark: SparkSession, root: String): Long = {
    val (fs, qroot) = fsOf(spark, root)
    val marker = new Path(qroot, "_log/_lastbatch")
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Idempotent streaming append: commit `batch` as a new version unless
    * this `batchId` already committed (a foreachBatch re-run after a
    * crash between sink commit and checkpoint advance re-delivers the
    * same batch — the marker turns at-least-once delivery into an
    * exactly-once LOG). The marker is advanced only after the manifest
    * rename, so a crash between the two re-runs the batch and the
    * manifest rename's no-overwrite check makes the duplicate commit
    * fail loudly rather than double-append silently. */
  def commitStreamingBatch(
      spark: SparkSession, root: String, batch: DataFrame, batchId: Long): Boolean = {
    if (batchId <= lastCommittedBatch(spark, root)) return false
    if (versions(spark, root).isEmpty) init(spark, root, batch)
    else append(spark, root, batch)
    val (fs, qroot) = fsOf(spark, root)
    val marker = new Path(qroot, "_log/_lastbatch")
    val tmp = new Path(qroot, "_log/._lastbatch.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    fs.delete(marker, false)
    require(fs.rename(tmp, marker), s"failed to advance batch marker at $root")
    true
  }

  /** Drop versions < `keepFrom` and physically delete every file no
    * retained manifest references. After this, time travel reaches back
    * only to `keepFrom`. Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, root: String, keepFrom: Long): Int = {
    val (fs, qroot) = fsOf(spark, root)
    val all = versions(spark, root)
    val (drop, keep) = all.partition(_ < keepFrom)
    require(keep.nonEmpty, s"vacuum would drop every version of $root")
    val referenced = keep.flatMap(v => readManifest(spark, root, v)).toSet
    val orphans = drop.flatMap(v => readManifest(spark, root, v)).distinct
      .filterNot(referenced.contains)
    orphans.foreach(f => fs.delete(new Path(qroot, f), false))
    drop.foreach(v => fs.delete(manifestPath(qroot, v), false))
    orphans.size
  }
}
