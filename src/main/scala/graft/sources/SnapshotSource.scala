package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.jobs.Snapshots

/** `spark.read` front door for snapshot-logged tables (jobs/Snapshots) —
  * the option-style single entry point a reader reaches for, wrapping the
  * same three read modes as `Snapshots.table`:
  *
  * {{{
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("versionAsOf", 3)        // time travel (default: latest)
  *     .load(root)
  *
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("timestampAsOf", "2026-08-13 12:00:00")  // or epoch millis
  *     .load(root)
  *
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("changesFrom", 0).option("changesTo", 2)   // CDC replay
  *     .load(root)
  *
  *   spark.read.format("graft.sources.SnapshotSource")
  *     .option("bloomOn", "doc_id")     // + bloom file pruning on equality
  *     .load(root)
  * }}}
  *
  * …and the `df.write` front door onto the same log:
  *
  * {{{
  *   df.write.format("graft.sources.SnapshotSource")
  *     .mode("append")                  // append | overwrite | ignore |
  *     .save(root)                      //   errorifexists (default)
  * }}}
  *
  * A write against a root with no log CREATES the table (any mode —
  * `SaveMode` only distinguishes behavior when the target exists, per
  * its own contract): options other than this source's reserved keys
  * ride along as table properties (e.g. parquet bloom opt-ins), recorded
  * in the log and applied to every future commit. Against an existing
  * table, `append` is the OCC rebasing append (schema widening rules),
  * `overwrite` the one-commit full replace (schema replaced; concurrent
  * appends serialize after it), `errorifexists` refuses, `ignore`
  * no-ops. The incoming DataFrame is written executor-parallel by the
  * log's own commit path — nothing is collected to the driver.
  *
  * …and `writeStream` for exactly-once streaming ingest:
  *
  * {{{
  *   df.writeStream.format("graft.sources.SnapshotSource")
  *     .option("checkpointLocation", cp)
  *     .trigger(Trigger.AvailableNow())   // or processing-time
  *     .start(root)
  * }}}
  *
  * …and `readStream` for tailing the log as a streaming SOURCE (offsets
  * are table versions; see sources/SnapshotStreamSource for semantics):
  *
  * {{{
  *   spark.readStream.format("graft.sources.SnapshotSource")
  *     .option("maxFilesPerTrigger", 4)   // admission pacing (optional)
  *     .option("skipRewrites", true)      // admit delete/merge histories
  *     .option("startingVersion", 3)      // tail from v3 on (inclusive)
  *     .option("startingTimestamp", t)    // or: from the first version
  *     .load(root)                        //   committed at-or-after t
  *
  *   spark.readStream.format("graft.sources.SnapshotSource")
  *     .option("readChangeFeed", true)    // stream ROW CHANGES (_op col):
  *     .load(root)                        //   the CDC view of each commit
  * }}}
  *
  * Each micro-batch commits through `Snapshots.commitStreamingBatch`:
  * the batch id rides INSIDE the committed delta (`#txn:`), so a batch
  * re-delivered after a crash between sink commit and checkpoint
  * advance is a recognized no-op — exactly-once without a marker file.
  * Append output mode only (Update re-emits changed rows; appending
  * them would double-count).
  *
  * The version read is a NATIVE file-source relation: a
  * `HadoopFsRelation` over `SnapshotFileIndex` (the log's explicit file
  * list + stats/bloom pruning inside `listFiles`), planned by Spark's
  * own FileSourceStrategy into a `FileSourceScanExec` — vectorized
  * parquet reads, whole-stage codegen, row-group `PushedFilters` — the
  * same integration shape Delta/Iceberg use. File-level pruning happens
  * at PLAN time from the cached per-version stats index
  * (`Snapshots.statsIndex`): the scan plans O(matching files), never
  * O(table files). With `bloomOn=<col>`, string-equality predicates on
  * that column additionally consult per-file parquet bloom filters
  * (executor-distributed probes; opt-in because each probe is a footer
  * round-trip per file per query, worth it exactly for the
  * needle-in-haystack point lookup). All pruning is a superset filter —
  * the exact predicate still runs in the scan. */
class SnapshotSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  /** Option keys the source itself consumes — everything else a writer
    * passes becomes a TABLE PROPERTY at create time. */
  private val reservedKeys =
    Set("path", "versionasof", "timestampasof", "changesfrom", "changesto",
      "bloomon", "skiprewrites", "maxfilespertrigger", "maxbytespertrigger",
      "maxversionspertrigger", "startingversion", "startingtimestamp",
      "readchangefeed", "rowids")

  /** Epoch millis from either a raw long or a `Timestamp.valueOf` string
    * (`yyyy-mm-dd hh:mm:ss[.f…]`, session-local zone — the same spelling
    * Delta's `timestampAsOf` takes). */
  private def parseTsMillis(s: String): Long =
    s.toLongOption.getOrElse(java.sql.Timestamp.valueOf(s).getTime)

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot source needs a path: .load(root)"))
    val spark = sqlContext.sparkSession
    (parameters.get("changesfrom"), parameters.get("changesto")) match {
      case (Some(a), Some(b)) =>
        // ONE CDC column contract across all three front doors (batch
        // option, table_changes TVF, streaming CDF): every change row
        // carries _commit_version/_commit_timestamp, like Delta's CDF
        require(a.toLong < b.toLong,
          s"empty change range (${a.toLong}, ${b.toLong}]")
        new SnapshotRelation(sqlContext,
          GraftTableChanges.changes(spark, root, a.toLong + 1, b.toLong))
      case (None, None) =>
        val v0 = parameters.get("versionasof").map(_.toLong).getOrElse(-1L)
        val v = parameters.get("timestampasof") match {
          case Some(t) =>
            require(v0 < 0, "versionAsOf and timestampAsOf are mutually exclusive")
            Snapshots.versionAt(spark, root, parseTsMillis(t))
          case None =>
            if (v0 < 0) Snapshots.latestVersion(spark, root) else v0
        }
        // merge-on-read deletion vectors: a DV-carrying version cannot
        // be served as a bare file relation (the scan would resurrect
        // deleted rows). DeletionVectorsRule — registered here, per
        // session — rewrites the relation at optimization time into the
        // NATIVE scan anti-joined (broadcast) with the DV sidecar on
        // the scan's own `_metadata` positions, keeping vectorization
        // and pushdown; `materializeDeletionVectors` removes even that.
        if (Snapshots.liveDeletionVectors(spark, root, v).nonEmpty)
          DeletionVectorsRule.register(spark)
        // hidden partitioning: derive partition predicates from
        // source-column predicates when a partition column is generated
        val vProps = Snapshots.tableProperties(spark, root, v)
        if (graft.core.HivePartitions.columnsOf(vProps)
            .exists(c => vProps.contains(s"graft.generated.$c")))
          GeneratedPruningRule.register(spark)
        // NOT-NULL-DEFAULT columns: pre-declaration files null-fill —
        // the rule coalesces them to the declared constant in the plan
        if (vProps.keys.exists(_.startsWith("graft.default.")))
          ColumnDefaultsRule.register(spark)
        // metadata-only COUNT/MIN/MAX from the log's stats envelopes
        MetadataAggRule.register(spark)
        val recorded = Snapshots.versionSchema(spark, root, v)
          .getOrElse(Snapshots.readVersion(spark, root, v).schema)
        // row tracking: the engine-managed `_row_id` column is HIDDEN
        // from SELECT * (Delta hides row ids the same way) — opt back
        // in per read with .option("rowIds", "true")
        val showRowIds = parameters.get("rowids").exists(_.equalsIgnoreCase("true"))
        val fullSchema =
          if (showRowIds) recorded
          else Snapshots.visibleSchema(recorded, vProps)
        // a NATIVE file-source relation over the log's FileIndex: planned
        // by FileSourceStrategy into FileSourceScanExec — vectorized
        // parquet reads, whole-stage codegen, row-group pushdown — with
        // file-level stats/bloom pruning inside listFiles. Partitioned
        // tables carry their REAL partition schema (columns live in the
        // paths, not the files), so Catalyst partition-prunes the scan;
        // their partition columns surface AFTER the data columns, the
        // file-source relation convention.
        val index = new SnapshotFileIndex(spark, root, v, parameters.get("bloomon"))
        val dataSchema =
          if (index.partitionSchema.isEmpty) fullSchema
          else if (showRowIds) index.dataSchema
          else Snapshots.visibleSchema(index.dataSchema, vProps)
        // column-mapped versions (renamed columns) scan through the
        // translating format: the plan speaks logical names, the files
        // physical ones
        val nameMap = Snapshots.physicalMap(fullSchema).filter { case (l, p) => l != p }
        org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          index,
          partitionSchema = index.partitionSchema,
          dataSchema = dataSchema,
          // bucketed tables surface their layout: co-bucketed joins
          // plan zero exchanges, point lookups prune to one bucket
          bucketSpec = Snapshots.bucketSpecOf(
            Snapshots.tableProperties(spark, root, v)),
          fileFormat =
            if (nameMap.isEmpty)
              new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
            else new MappedParquetFileFormat(nameMap),
          options = Map.empty)(spark)
      case _ =>
        throw new IllegalArgumentException(
          "changesFrom and changesTo must be set together")
    }
  }

  /** `df.write.format(…).mode(…).save(root)` — the write front door.
    * Dispatches to the log's own commit paths (OCC append / one-commit
    * overwrite / init), so every guarantee the programmatic API gives —
    * atomic no-replace delta publish, write-time `#stats:` envelopes,
    * CHECK-constraint gating, schema evolution rules — holds for writes
    * that never import `graft.jobs`. The DataFrame is written by the
    * normal distributed parquet path; the driver touches metadata only. */
  override def createRelation(
      sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot sink needs a path: .save(root)"))
    val spark = sqlContext.sparkSession
    if (Snapshots.versions(spark, root).isEmpty) {
      // DSv1 lowercases option keys; re-canonicalize the one mixed-case
      // graft property so the commit path's exact-key lookup finds it
      val props = parameters
        .filterNot { case (k, _) => reservedKeys.contains(k.toLowerCase) }
        .map { case (k, v) =>
          (if (k.equalsIgnoreCase("graft.parquet.timestampMicros"))
            "graft.parquet.timestampMicros"
          else if (k.equalsIgnoreCase("graft.autoCompact.smallBytes"))
            "graft.autoCompact.smallBytes"
          else k) -> v
        }
      Snapshots.init(spark, root, data, props)
    } else mode match {
      case SaveMode.Append => Snapshots.append(spark, root, data)
      case SaveMode.Overwrite => Snapshots.overwrite(spark, root, data)
      case SaveMode.ErrorIfExists => throw new IllegalArgumentException(
        s"snapshot log already exists at $root (mode ErrorIfExists)")
      case SaveMode.Ignore => ()
    }
    createRelation(sqlContext, parameters)
  }

  /** `df.writeStream.format(…).start(root)` — exactly-once streaming
    * ingest onto the log (see class scaladoc). */
  override def createSink(
      sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot sink needs a path: .start(root)"))
    require(partitionColumns.isEmpty,
      "snapshot sink does not take partitionBy (layout is the log's concern)")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"snapshot sink is append-only — each micro-batch is one #txn-tagged " +
        s"commit; got $outputMode")
    new SnapshotStreamSink(root)
  }

  /** `spark.readStream.format(…).load(root)` — the log as a streaming
    * source (see SnapshotStreamSource). The schema is resolved ONCE here
    * at stream definition; Spark passes it back at createSource. */
  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot stream source needs a path: .load(root)"))
    val spark = sqlContext.sparkSession
    val s = schema.getOrElse {
      val v = Snapshots.latestVersion(spark, root)
      val recorded = Snapshots.versionSchema(spark, root, v)
        .getOrElse(Snapshots.readVersion(spark, root, v).schema)
      // the change-feed stream KEEPS row tracking's `_row_id` (following
      // one logical row across updates is what ids are for); the plain
      // table tail hides it like the batch front doors
      if (parameters.get("readchangefeed").exists(_.toBoolean))
        StructType(recorded.fields ++ Seq(
          org.apache.spark.sql.types.StructField(
            graft.jobs.ChangeFeed.opCol, org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField(
            "_commit_version", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(
            "_commit_timestamp", org.apache.spark.sql.types.TimestampType)))
      else Snapshots.visibleSchema(recorded,
        Snapshots.tableProperties(spark, root, v))
    }
    (shortName(), s)
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot stream source needs a path: .load(root)"))
    new SnapshotStreamSource(sqlContext.sparkSession, root, parameters)
  }
}

/** Streaming sink half of the front door: every micro-batch is one
  * `Snapshots.commitStreamingBatch` — data and batch-id bookkeeping in
  * ONE atomic delta rename (`#txn:`), so crash-replayed batches are
  * recognized no-ops (exactly-once, markerless).
  *
  * The DataFrame a DSv1 sink receives is backed by the STREAMING
  * (incremental) plan — it cannot be handed to `df.write` directly. It
  * is re-batched the way Spark's own `ForeachBatchSink` does: execute
  * the incremental plan once (`toRdd`) and deserialize executor-side
  * into an external batch frame. The per-row decode is micro-batch
  * grain only — the table write underneath is the normal distributed
  * vectorized parquet path, and the batch-vs-table size ratio makes the
  * bridge cost noise at 100 TB (ingest batches are minutes of data).
  * Pipelines that want the zero-copy shape use `foreachBatch` +
  * `Snapshots.commitStreamingBatch` directly (streaming/StreamingJobs
  * does) — the commit semantics are identical. */
private[sources] class SnapshotStreamSink(root: String)
  extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val schema = data.schema
    val deser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(schema)
      .resolveAndBind().createDeserializer()
    val rows = data.queryExecution.toRdd.mapPartitions(_.map(ir => deser(ir)))
    val batch = spark.createDataFrame(rows, schema)
    Snapshots.commitStreamingBatch(spark, root, batch, batchId)
  }

  override def toString: String = s"SnapshotStreamSink[$root]"
}

/** Shared filter translation: the predicate subset re-expressible on a
  * delegate DataFrame (and thus pushable to its parquet scan). */
private[sources] object SnapshotFilters {
  def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNotNull(a) => Some(col(a).isNotNull)
    case IsNull(a) => Some(col(a).isNull)
    case And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case _ => None
  }

}

/** CDC-replay relation: delegates to the (small, already-explicit) feed
  * read; filters and projection still reach its parquet scan. */
private[sources] class SnapshotRelation(
    val sqlContext: SQLContext, delegate: DataFrame)
  extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = delegate.schema

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => SnapshotFilters.translate(f).isEmpty)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(SnapshotFilters.translate)
      .foldLeft(delegate)((df, c) => df.where(c))
    val projected =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}

