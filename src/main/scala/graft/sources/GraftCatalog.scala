package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsPartitionManagement, SupportsWrite, Table, TableCapability, TableCatalog}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe, EqualTo, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.jobs.Snapshots

/** DSv2 `TableCatalog` for snapshot-logged tables — the naming/DDL shell
  * that makes the log a first-class SQL citizen with ZERO query-side
  * ceremony (no temp views, no `USING graft-snapshot` registration):
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft   (named tables)
  *
  *   SELECT * FROM graft.t                              -- name-resolved
  *   SELECT * FROM graft.t VERSION AS OF 3              -- time travel
  *   SELECT * FROM graft.t TIMESTAMP AS OF '2026-08-13' -- time travel
  *   SELECT * FROM graft.`/abs/path/tbl`                -- path-addressed
  *   INSERT INTO graft.t SELECT …                       -- OCC append
  *   INSERT OVERWRITE graft.t [PARTITION (p=v)] …       -- full / partition
  *   CREATE TABLE graft.t (…) PARTITIONED BY (p)        -- init empty log
  *   CREATE TABLE graft.t2 AS SELECT …                  -- CTAS
  *   SHOW PARTITIONS graft.t / DESCRIBE TABLE graft.t
  * }}}
  *
  * Spark-first by construction, the Delta-catalog integration shape:
  * the catalog returns a lightweight metadata `Table` (schema /
  * partitioning / properties / capabilities) and the companion analyzer
  * rule (`GraftExtensions`, `spark.sql.extensions`) swaps its READ
  * relations for the log's native V1 plan — `HadoopFsRelation` over
  * `SnapshotFileIndex` — so catalog reads plan the IDENTICAL
  * `FileSourceScanExec` as every other front door: vectorized parquet,
  * whole-stage codegen, plan-time stats/bloom/partition pruning,
  * deletion-vector application. Writes route through `V1Write` /
  * `InsertableRelation` fallbacks into the log's own commit paths
  * (`append` / `overwrite` / `replaceWhere` / `overwritePartitions`),
  * so SQL writers get the same OCC, CHECK gating, generated columns and
  * schema-evolution rules as the programmatic API.
  *
  * Table resolution: an identifier whose name starts with `/` (or
  * carries a URI scheme) IS the table root — ``graft.`/abs/path` `` —
  * Delta's ``delta.`/path` `` convention; otherwise the root is
  * `<warehouse>/<namespace…>/<name>` under the catalog's `warehouse`
  * option. At 100 TB the catalog stays METADATA-ONLY: every operation
  * here reads commit headers (O(1) per table), never data. */
class GraftCatalog extends TableCatalog {

  private var catalogName = "graft"
  private var warehouse: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  private def session: SparkSession = SparkSession.active

  private def isPath(name: String): Boolean =
    name.startsWith("/") || name.contains("://")

  private[sources] def rootOf(ident: Identifier): String =
    if (isPath(ident.name)) {
      require(ident.namespace.isEmpty,
        s"path-addressed table takes no namespace: ${ident.namespace.mkString(".")}")
      ident.name
    } else warehouse match {
      case Some(wh) => (wh +: ident.namespace :+ ident.name).mkString("/")
      case None => throw new IllegalArgumentException(
        s"catalog $catalogName has no warehouse — set " +
          s"spark.sql.catalog.$catalogName.warehouse for named tables, or " +
          s"address tables by path: $catalogName.`/abs/path`")
    }

  override def tableExists(ident: Identifier): Boolean =
    Snapshots.versions(session, rootOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse match {
      case None => Array.empty
      case Some(wh) =>
        val dir = new Path((wh +: namespace).mkString("/"))
        val fs = dir.getFileSystem(session.sparkContext.hadoopConfiguration)
        if (!fs.exists(dir)) Array.empty
        else fs.listStatus(dir).toSeq
          .filter(s => s.isDirectory && fs.exists(new Path(s.getPath, "_log")))
          .map(s => Identifier.of(namespace, s.getPath.getName)).toArray
    }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (Snapshots.versions(session, root).isEmpty) throw new NoSuchTableException(ident)
    new GraftTable(session, root, None)
  }

  /** `VERSION AS OF v` — Spark's time-travel resolution calls this. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (Snapshots.versions(session, root).isEmpty) throw new NoSuchTableException(ident)
    new GraftTable(session, root, Some(version.toLong))
  }

  /** `TIMESTAMP AS OF ts` — `timestamp` arrives in epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (Snapshots.versions(session, root).isEmpty) throw new NoSuchTableException(ident)
    new GraftTable(session, root,
      Some(Snapshots.versionAt(session, root, timestamp / 1000L)))
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = rootOf(ident)
    require(Snapshots.versions(session, root).isEmpty,
      s"table already exists at $root")
    val partCols = partitions.toSeq.map { t =>
      val refs = t.references()
      require(t.name == "identity" && refs.length == 1,
        s"only identity partitioning is supported, got: $t")
      refs.head.fieldNames.mkString(".")
    }
    // Spark-reserved properties (provider/location/owner…) don't ride the log
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_TABLE_TYPE,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_COLLATION)
    val props = properties.asScala.toMap.filterNot { case (k, _) =>
      reserved.contains(k) || k.startsWith(TableCatalog.OPTION_PREFIX) }
    val withPart =
      if (partCols.isEmpty) props
      else props + (graft.core.HivePartitions.prop -> partCols.mkString(","))
    val empty = session.createDataFrame(
      util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    Snapshots.init(session, root, empty, withPart)
    new GraftTable(session, root, None)
  }

  /** ALTER TABLE → the log's METADATA-ONLY commits: ADD COLUMNS widens
    * the schema (existing files null-fill at read), RENAME/DROP COLUMN
    * are column-mapping commits (frozen physical names, zero rewrites),
    * SET/UNSET TBLPROPERTIES is one property commit. Anything else —
    * type changes, nested fields, position moves — fails loudly. */
  override def alterTable(
      ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange._
    val root = rootOf(ident)
    val sets = changes.collect { case s: SetProperty => s.property -> s.value }.toMap
    val unsets = changes.collect { case r: RemoveProperty => r.property }
    if (sets.nonEmpty || unsets.nonEmpty)
      Snapshots.setProperties(session, root, sets, unsets)
    // ALL AddColumn changes of one ALTER fold into ONE metadata commit
    // (schema + every `graft.default.*` prop together) — a failed or
    // OCC-refused commit can never leave the statement half-applied
    val adds = changes.collect { case a: AddColumn =>
      require(a.fieldNames.length == 1,
        s"nested ADD COLUMN is not supported: ${a.fieldNames.mkString(".")}")
      org.apache.spark.sql.types.StructField(
        a.fieldNames.head, a.dataType, a.isNullable) ->
        Option(a.defaultValue()).map(_.getSql)
    }
    if (adds.nonEmpty) Snapshots.addColumnsWithDefaults(session, root, adds)
    changes.foreach {
      case _: SetProperty | _: RemoveProperty | _: AddColumn => ()
      // NOTE: AddConstraint/DropConstraint never reach here — Spark's
      // ResolveSessionCatalog refuses constraint DDL for tables exposing
      // the V1 streaming fallback, so GraftSqlParser intercepts the two
      // ALTER … CONSTRAINT statements before analysis instead
      case r: RenameColumn =>
        require(r.fieldNames.length == 1,
          s"nested RENAME COLUMN is not supported: ${r.fieldNames.mkString(".")}")
        Snapshots.renameColumn(session, root, r.fieldNames.head, r.newName)
      case d: DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"nested DROP COLUMN is not supported: ${d.fieldNames.mkString(".")}")
        Snapshots.dropColumn(session, root, d.fieldNames.head)
      case u: UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"nested ALTER COLUMN TYPE is not supported: ${u.fieldNames.mkString(".")}")
        // type WIDENING: metadata-only, zero rewrites (vectorized reads
        // up-cast old files at scan time); narrowing is refused inside
        Snapshots.alterColumnType(session, root, u.fieldNames.head, u.newDataType)
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other")
    }
    loadTable(ident)
  }

  /** Drops the table DATA (the log directory) — the path-catalog
    * equivalent of an unmanaged drop does not exist here, every table
    * IS its directory. */
  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    val p = new Path(root)
    val fs = p.getFileSystem(session.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported (a table is addressed by its path)")

  override def invalidateTable(ident: Identifier): Unit = ()
}

/** The catalog's `Table`: metadata + write support. Reads never execute
  * through this object — `GraftExtensions`' analyzer rule swaps the
  * relation for the native V1 file-scan plan (see GraftCatalog doc). */
private[sources] class GraftTable(
    spark: SparkSession, val root: String, pinned: Option[Long])
  extends Table with SupportsWrite with SupportsPartitionManagement
  with org.apache.spark.sql.connector.catalog.TruncatableTable
  with org.apache.spark.sql.classic.GraftV1StreamFallback {

  /** `spark.readStream.table("graft.t")` — the streaming read goes
    * through Spark's V1 fallback for V2 tables: this synthetic
    * CatalogTable names the `graft-snapshot` provider and the root, so
    * MicroBatchExecution plans the SAME `SnapshotStreamSource`
    * (versions as offsets, pacing options, CDC mode) the format-string
    * front door uses. */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
    CatalogTable(
      identifier = org.apache.spark.sql.catalyst.TableIdentifier(root, Some("graft")),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(root).toUri),
        properties = Map("path" -> root)),
      schema = schema(),
      provider = Some("graft-snapshot"),
      // the LOG's numbers, surfaced to Catalyst: LogicalRelation's
      // computeStats prefers CatalogStatistics over bare file sizes, so
      // joins between two catalog-named snapshot tables make broadcast
      // and (under CBO) join-order decisions from O(log) metadata —
      // byte size from the pinned version's file statuses, row count
      // summed from the `#stats:` envelopes (None on DV-carrying
      // versions, where envelope rows over-count)
      stats = Some(CatalogStatistics(
        sizeInBytes = BigInt(index.sizeInBytes),
        rowCount = Snapshots.rowCount(spark, root, snapshotVersion).map(BigInt(_)),
        // ANALYZE TABLE's per-column NDV/nulls/min/max (decoded from
        // the `graft.colstat.*` properties) — CBO's selectivity and
        // join-reorder inputs
        colStats = Snapshots.columnStatistics(spark, root, snapshotVersion)
          .map { case (c, s) =>
            c -> org.apache.spark.sql.catalyst.catalog.CatalogColumnStat(
              distinctCount = Some(BigInt(s.ndv)),
              min = s.min, max = s.max,
              nullCount = Some(BigInt(s.nullCount)),
              avgLen = s.avgLen, maxLen = s.maxLen)
          })))
  }

  /** `TRUNCATE TABLE` — one empty-overwrite commit; history intact. */
  override def truncateTable(): Boolean = {
    val schema = Snapshots.versionSchema(spark, root)
      .getOrElse(Snapshots.readVersion(spark, root).schema)
    Snapshots.overwrite(spark, root, spark.createDataFrame(
      util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
    true
  }

  /** Resolved AT LOAD: a DataFrame over this table reads one consistent
    * snapshot for its lifetime (the same pin `readVersion` takes). */
  val snapshotVersion: Long = pinned.getOrElse(Snapshots.latestVersion(spark, root))

  private[sources] lazy val index = new SnapshotFileIndex(spark, root, snapshotVersion, None)

  private lazy val fullSchema: StructType = {
    // the catalog surface always hides engine-managed columns (row
    // tracking's `_row_id`); the spark.read front door's
    // .option("rowIds", "true") is the opt-in read surface for ids
    val props = Snapshots.tableProperties(spark, root, snapshotVersion)
    val visible = Snapshots.visibleSchema(
      Snapshots.versionSchema(spark, root, snapshotVersion)
        .getOrElse(Snapshots.readVersion(spark, root, snapshotVersion).schema),
      props)
    // defaulted columns surface Spark's own CURRENT_DEFAULT/
    // EXISTS_DEFAULT field metadata, so the analyzer fills them for
    // partial-column INSERTs (`INSERT INTO t (k, v) …`) natively
    val defaults = Snapshots.defaultsOf(props).map(d => d._1 -> d._3).toMap
    if (defaults.isEmpty) visible
    else StructType(visible.fields.map { f =>
      defaults.get(f.name).fold(f) { sql =>
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString("CURRENT_DEFAULT", sql)
          .putString("EXISTS_DEFAULT", sql).build())
      }
    })
  }

  override def name(): String =
    pinned.fold(root)(v => s"$root@v$v")

  /** File-source column order: data columns first, partition columns
    * last — matching the HadoopFsRelation output the reads plan. */
  override def schema(): StructType =
    if (index.partitionSchema.isEmpty) fullSchema
    else StructType((index.dataSchema ++ index.partitionSchema).toArray)

  override def partitioning(): Array[Transform] =
    Snapshots.partitionColumns(spark, root, snapshotVersion)
      .map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] =
    Snapshots.tableProperties(spark, root, snapshotVersion).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC)

  /** The native read plan — IDENTICAL construction to the spark.read
    * front door (SnapshotSource.createRelation): HadoopFsRelation over
    * SnapshotFileIndex, column-mapping-aware format, DV rule armed. */
  private[sources] def hadoopFsRelation
      : org.apache.spark.sql.execution.datasources.HadoopFsRelation = {
    if (Snapshots.liveDeletionVectors(spark, root, snapshotVersion).nonEmpty)
      DeletionVectorsRule.register(spark)
    val vProps = Snapshots.tableProperties(spark, root, snapshotVersion)
    if (graft.core.HivePartitions.columnsOf(vProps)
        .exists(c => vProps.contains(s"graft.generated.$c")))
      GeneratedPruningRule.register(spark)
    if (vProps.keys.exists(_.startsWith("graft.default.")))
      ColumnDefaultsRule.register(spark)
    MetadataAggRule.register(spark)
    val nameMap = Snapshots.physicalMap(fullSchema).filter { case (l, p) => l != p }
    org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index,
      partitionSchema = index.partitionSchema,
      dataSchema =
        if (index.partitionSchema.isEmpty) fullSchema
        else Snapshots.visibleSchema(index.dataSchema, vProps),
      bucketSpec = Snapshots.bucketSpecOf(vProps),
      fileFormat =
        if (nameMap.isEmpty)
          new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
        else new MappedParquetFileFormat(nameMap),
      options = Map.empty)(spark)
  }

  // ---- SupportsWrite: V1Write fallbacks into the log's commit paths

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwrite
        with SupportsDynamicOverwrite with SupportsTruncate {
      private var mode: String = "append"
      private var overwriteFilters: Array[Filter] = Array.empty

      override def truncate(): WriteBuilder = { mode = "truncate"; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue])) truncate()
        else { mode = "replaceWhere"; overwriteFilters = filters; this }
      }
      override def overwriteDynamicPartitions(): WriteBuilder = { mode = "dynamic"; this }

      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = mode match {
              case "append" => Snapshots.append(spark, root, data)
              case "truncate" => Snapshots.overwrite(spark, root, data)
              case "replaceWhere" =>
                Snapshots.replaceWhere(spark, root, data,
                  overwriteFilters.map(filterSql).mkString(" AND "))
              case "dynamic" => Snapshots.overwritePartitions(spark, root, data)
            }
          }
      }
    }

  /** Static-partition overwrite filters → the predicate SQL
    * `replaceWhere` takes. INSERT OVERWRITE's static spec only produces
    * (null-safe) equalities on partition columns. */
  private def filterSql(f: Filter): String = f match {
    case EqualTo(a, v) => s"`$a` = ${lit(v)}"
    case EqualNullSafe(a, v) => s"`$a` <=> ${lit(v)}"
    case other => throw new IllegalArgumentException(
      s"unsupported INSERT OVERWRITE filter: $other")
  }
  private def lit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case ts: java.sql.Timestamp => s"TIMESTAMP '$ts'"
    case d: java.sql.Date => s"DATE '$d'"
    case other => String.valueOf(other)
  }

  // ---- SupportsPartitionManagement (read-only: SHOW PARTITIONS)

  override def partitionSchema(): StructType = index.partitionSchema

  override def listPartitionIdentifiers(
      names: Array[String], ident: InternalRow): Array[InternalRow] = {
    val pSchema = index.partitionSchema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val rows = Snapshots.versionFiles(spark, root, snapshotVersion)
      .map(f => graft.core.HivePartitions.internalRowOf(f, pSchema, tz))
      .distinct
    if (names.isEmpty) rows.toArray
    else {
      val idx = names.map(pSchema.fieldIndex)
      rows.filter { r =>
        idx.indices.forall { i =>
          val dt = pSchema.fields(idx(i)).dataType
          val a = r.get(idx(i), dt); val b = ident.get(i, dt)
          a == b
        }
      }.toArray
    }
  }

  override def createPartition(
      ident: InternalRow, properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "partitions materialize from writes; ADD PARTITION is meaningless here")
  override def dropPartition(ident: InternalRow): Boolean =
    throw new UnsupportedOperationException(
      "use DELETE FROM / replaceWhere to remove a partition's rows")
  override def replacePartitionMetadata(
      ident: InternalRow, properties: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("partition metadata is the path")
  override def loadPartitionMetadata(ident: InternalRow): util.Map[String, String] =
    util.Collections.emptyMap()
}
