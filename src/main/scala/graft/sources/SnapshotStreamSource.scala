package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.jobs.{Snapshots, TableSync}

/** `spark.readStream` over a snapshot-logged table — the streaming SOURCE
  * half of the front door (Delta's streaming source / Iceberg's
  * incremental read, on this log). Offsets ARE table versions: each
  * micro-batch is the files appended by versions (start, end], read by
  * the native parquet scan path, so progress tracking needs no side
  * state — the checkpoint stores a version number and the log names the
  * files. Exactly-once follows from version immutability: re-processing
  * a (start, end] range after a crash yields bit-identical input.
  *
  * Semantics mirror `jobs/TableSync` (the batch tail):
  *   - OPTIMIZE commits are skipped automatically — same rows, different
  *     files; tailing their adds would double-count.
  *   - Other rewrites (delete / merge / restore) fail loudly unless
  *     `.option("skipRewrites", true)` — Delta's `skipChangeCommits`
  *     admission. Rewrite-aware consumers replay the change feed
  *     instead (`changesFrom`/`changesTo` batch reads).
  *   - `.option("maxFilesPerTrigger", n)` / `.option("maxBytesPerTrigger",
  *     b)` pace admission: getOffset advances version-at-a-time until the
  *     next version would exceed a cap (always admitting at least one
  *     version — a single commit is the atom; splitting it would tear
  *     commit atomicity).
  *   - `.option("startingVersion", v)` tails from version `v` INCLUSIVE
  *     (Delta's `startingVersion` convention — a consumer migrating a
  *     checkpointed offset of "last processed = v" passes v+1). Default:
  *     from table birth — v0's initial files included.
  *
  * Schema is fixed at stream start (the head schema when the source is
  * created); files committed before an add-column evolution null-fill
  * through the parquet reader's missing-column path. 100 TB shape: a
  * micro-batch plans O(files appended since the last trigger) — the log
  * names them outright, no directory listing or diffing — and the data
  * moves through the same vectorized `FileSourceScanExec` as a batch
  * read of the table. */
private[sources] class SnapshotStreamSource(
    spark: SparkSession, root: String, parameters: Map[String, String])
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val skipRewrites = parameters.get("skiprewrites").exists(_.toBoolean)
  private val maxFiles = parameters.get("maxfilespertrigger").map(_.toInt)
  private val maxBytes = parameters.get("maxbytespertrigger").map(_.toLong)

  /** `.option("maxVersionsPerTrigger", n)`: admit at most n VERSIONS
    * (commits) per micro-batch — the commit-grain pacing knob, valid in
    * BOTH modes. In `readChangeFeed` mode `n = 1` is the IVM contract:
    * each micro-batch is exactly one commit's change set, so a
    * downstream apply sees changes in commit order and can never fold
    * an insert and its own later update into one unordered multiset. */
  private val maxVersions = parameters.get("maxversionspertrigger").map(_.toInt)
  require(maxVersions.forall(_ >= 1), "maxVersionsPerTrigger must be >= 1")
  /** Exclusive lower bound on versions to emit: one BELOW the inclusive
    * `startingVersion` option (Delta convention); or, with
    * `startingTimestamp` (epoch millis or `yyyy-mm-dd hh:mm:ss`), one
    * below the earliest version committed at-or-after that moment
    * (Delta parity — a timestamp past the last commit starts an empty
    * tail that emits future commits); table birth when neither is set. */
  private val startPos = {
    val byVersion = parameters.get("startingversion")
    val byTs = parameters.get("startingtimestamp")
    require(byVersion.isEmpty || byTs.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    byVersion.map(_.toLong - 1)
      .orElse(byTs.map { t =>
        val ms = t.toLongOption.getOrElse(java.sql.Timestamp.valueOf(t).getTime)
        Snapshots.versionAtOrAfter(spark, root, ms) - 1
      })
      .getOrElse(-1L)
  }

  /** `.option("readChangeFeed", true)`: stream ROW-LEVEL CHANGES instead
    * of appended files — each micro-batch is `Snapshots.changesBetween`
    * over the offset range (`_op` column: insert / update_preimage /
    * update_postimage / delete; appends synthesize inserts from the files
    * the log names). Rewrite commits are the POINT of this mode, so
    * `skipRewrites` is contradictory, and `maxFilesPerTrigger` is a
    * file-grain concept — both refused rather than silently bent. */
  private val readChangeFeed = parameters.get("readchangefeed").exists(_.toBoolean)
  require(!readChangeFeed || !skipRewrites,
    "readChangeFeed streams rewrites as row changes — skipRewrites does not combine")
  require(!readChangeFeed || (maxFiles.isEmpty && maxBytes.isEmpty),
    "maxFilesPerTrigger/maxBytesPerTrigger pace file-grain tailing, not the " +
      "change feed — use maxVersionsPerTrigger (commit grain) with readChangeFeed")

  private val qroot: Path = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
  }

  private def headSchema: StructType = {
    val v = Snapshots.latestVersion(spark, root)
    val s = Snapshots.versionSchema(spark, root, v)
      .getOrElse(Snapshots.readVersion(spark, root, v).schema)
    // plain table-tail streams hide row tracking's `_row_id` like the
    // batch front doors; the CHANGE-FEED stream keeps it — following one
    // logical row across updates is exactly what row ids are for
    if (readChangeFeed) s
    else Snapshots.visibleSchema(s, Snapshots.tableProperties(spark, root, v))
  }

  override val schema: StructType =
    if (readChangeFeed)
      StructType(headSchema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(
          graft.jobs.ChangeFeed.opCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          "_commit_version", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "_commit_timestamp", org.apache.spark.sql.types.TimestampType)))
    else headSchema

  /** FROZEN at stream start, like `schema` itself: the column-mapping
    * translation and partition columns the micro-batch reads plan with.
    * Deriving them per batch from the LATEST version would silently
    * null a column renamed mid-stream (the frozen requested schema's
    * old logical name no longer in the newest map) — and they cost two
    * O(log) metadata reads per trigger for values that cannot change
    * for the life of the stream. */
  private val nameMap: Map[String, String] =
    Snapshots.physicalMap(schema).filter { case (l, p) => l != p }
  private val partCols: Seq[String] = Snapshots.partitionColumns(spark, root)

  /** Highest version already offered to the engine; rate limiting counts
    * forward from here. Re-derived from the engine's own offsets on
    * restart (recovery calls `getBatch` for the last completed batch
    * before asking for new offsets), so it is a cache, not state. */
  @volatile private var posV: Long = startPos

  private def asLong(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from the checkpoint
  }

  /** Under Trigger.AvailableNow the engine would otherwise WRAP this
    * source and pin the run's terminal offset to the first getOffset —
    * which is the PACED offset when maxFilesPerTrigger is set, silently
    * dropping the unpaced remainder. Implementing the trait ourselves
    * (Spark's FileStreamSource does the same) captures the true head
    * here; getOffset then paces toward it batch by batch and the run
    * terminates only when the head is reached. */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(Snapshots.versions(spark, root).lastOption.getOrElse(-1L))

  /** SupportsAdmissionControl entry (the engine prefers it over
    * `getOffset` once the trait is mixed in): same pacing, connector-
    * typed. ReadLimit is ignored — admission is the source's own
    * `maxFilesPerTrigger`, applied inside `getOffset`. The engine-
    * supplied `start` defensively seeds `posV` (normally redundant —
    * V1-source recovery re-inits it through `getBatch` — but it makes
    * paced restarts correct by this source's own logic rather than by a
    * version-coupled engine behavior: offsets can never regress below
    * what the engine says it already committed). */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    Option(start).map(_.json.trim.toLong).foreach(s => if (s > posV) posV = s)
    getOffset.orNull
  }

  override def getOffset: Option[V1Offset] = {
    val liveHead = Snapshots.versions(spark, root).lastOption.getOrElse(-1L)
    val head0 = availableNowTarget.fold(liveHead)(math.min(liveHead, _))
    // commit-grain pacing applies before (and independently of) the
    // file/byte admission loop below
    val head = maxVersions.fold(head0)(n => math.min(head0, posV + n))
    if (head < 0) return None
    if (head <= posV) return Some(LongOffset(math.min(posV, head)))
    val bounded =
      if (maxFiles.isEmpty && maxBytes.isEmpty) head
      else {
        // version-at-a-time admission, LAZY: each trigger reads exactly
        // the deltas it admits plus the first one it refuses —
        // O(admitted + 1) metadata reads, never a sweep of the whole
        // remaining backlog (a paced drain of a deep backlog would
        // otherwise pay O(backlog²) driver reads across its triggers).
        val hfs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
        var accFiles = 0
        var accBytes = 0L
        var last = posV
        var v = posV + 1
        var stop = false
        while (v <= head && !stop) {
          val paths = TableSync.appendedFilesOfVersion(spark, root, v, skipRewrites)
          // admit while under BOTH budgets; a version is atomic (one
          // commit), so the first always enters even if it alone exceeds
          // a cap. Byte sizes are per-file metadata RPCs, paid only for
          // admitted-or-probed versions and only when the byte cap is set.
          val bytes =
            if (maxBytes.isEmpty) 0L
            else paths.map(p => hfs.getFileStatus(new Path(p)).getLen).sum
          val first = accFiles == 0 && accBytes == 0L
          val admit = first ||
            (maxFiles.forall(accFiles + paths.size <= _) &&
              maxBytes.forall(accBytes + bytes <= _))
          if (admit) { accFiles += paths.size; accBytes += bytes; last = v; v += 1 }
          else stop = true
        }
        last
      }
    if (bounded <= posV) Some(LongOffset(posV)) else Some(LongOffset(bounded))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(asLong).getOrElse(startPos)
    val toV = asLong(end)
    if (toV > posV) posV = toV
    if (readChangeFeed) return changeFeedBatch(fromV, toV)
    val files = TableSync
      .appendedFilesPerVersion(spark, root, fromV, toV, skipRewrites)
      .flatMap(_._2)
    // NOT-NULL-DEFAULT columns: a replay of appends that predate the
    // declaration null-fills the column — same coalesce as batch reads
    def defaulted(df: DataFrame): DataFrame =
      Snapshots.applyDefaults(df, Snapshots.tableProperties(spark, root, toV))
    if (partCols.nonEmpty)
      // partitioned table: partition values ride the paths — plan the
      // micro-batch through the partition-aware index (same explicit
      // file list, partition columns from the path fragments)
      return defaulted(PartitionedRead.frame(
        spark, qroot, files, schema, partCols, streaming = true, nameMap = nameMap))
    val relation = HadoopFsRelation(
      new ExplicitFileIndex(spark, qroot, files),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat =
        if (nameMap.isEmpty)
          new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
        else new MappedParquetFileFormat(nameMap),
      options = Map.empty)(spark)
    defaulted(org.apache.spark.sql.classic.GraftSqlShim.ofRows(
      spark, LogicalRelation(relation, isStreaming = true)))
  }

  /** One CDC micro-batch: the feed rows of versions (fromV, toV],
    * conformed to the FIXED stream schema (pre-evolution feeds null-fill
    * the columns they predate), re-expressed as a streaming frame. Not a
    * file scan — a feed replay is already O(changed rows), the small side
    * of the table by construction. */
  private def changeFeedBatch(fromV: Long, toV: Long): DataFrame = {
    val batch =
      if (fromV >= toV) // recovery re-init of an empty range: typed, empty
        Snapshots.readVersion(spark, root, toV).limit(0)
          .withColumn(graft.jobs.ChangeFeed.opCol, org.apache.spark.sql.functions.lit("insert"))
      // the TVF codec: each commit's frame stamped with _commit_version
      // + the in-commit _commit_timestamp (Delta's streaming-CDF shape)
      else GraftTableChanges.changes(spark, root, fromV + 1, toV)
    val conformed = batch.select(schema.fields.toIndexedSeq.map { f =>
      if (batch.columns.contains(f.name))
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }: _*)
    org.apache.spark.sql.classic.GraftSqlShim.asStreaming(spark, conformed)
  }

  override def commit(end: V1Offset): Unit = {
    val v = asLong(end)
    if (v > posV) posV = v
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$root]"
}

/** A `FileIndex` over an explicit, already-final file list — the
  * micro-batch form (the batch-read form, `SnapshotFileIndex`, prunes a
  * VERSION's list by stats; a tail batch is already O(new files), so it
  * lists exactly what the log named and lets row-group pushdown do the
  * rest). */
private[sources] class ExplicitFileIndex(
    spark: SparkSession, qroot: Path, files: Seq[String]) extends FileIndex {

  private lazy val statuses: Seq[FileStatus] = {
    // the log already NAMES exactly this batch's files — stat each one
    // directly. A listStatus of the shared parent directory would be
    // O(table files) per trigger once the table grows (all commits'
    // files typically share root/data), defeating the tail's
    // O(files-appended-since-last-trigger) shape.
    val fs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    files.distinct.sorted.map(f => fs.getFileStatus(new Path(f)))
  }

  override def rootPaths: Seq[Path] = Seq(qroot)
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = () // committed files are immutable

  override def listFiles(
      partitionFilters: Seq[Expression], dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
}
