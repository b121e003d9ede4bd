package graft.sources

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StructType}

import graft.jobs.{Snapshots, SnapshotSql}

/** Parser extension (the Delta-SQL shape, `ext.injectParser`): the two
  * MAINTENANCE statements standard SQL has no spelling for, delegated
  * to Spark's own parser for everything else:
  *
  * {{{
  *   OPTIMIZE graft.`/path` [WHERE <partition pred>]
  *                          [ZORDER BY (a, b)]     -- Morton re-cluster
  *   VACUUM  graft.`/path` [RETAIN <n> HOURS]      -- default 168 (7d)
  *   RESTORE [TABLE] graft.`/path` TO VERSION AS OF 3
  *                                 TO TIMESTAMP AS OF '…'
  *   DESCRIBE HISTORY graft.`/path`
  *   CONVERT TO GRAFT graft.`/path` [PARTITIONED BY (cols)]
  * }}}
  *
  * Plain OPTIMIZE is the bin-packing small-file compaction
  * (`optimizeCompact` — rewrites only sub-target files, `WHERE` scopes
  * it to matching partitions); `ZORDER BY (a, b)` re-clusters by
  * explicit Morton cells so min/max skipping prunes BOTH dimensions;
  * one clustering column falls back to range-clustering. VACUUM keeps
  * every version a reader anchored inside the retention window could
  * still be using (`versionAt(now − retention)`), then deletes files
  * only older versions referenced. A table younger than the window
  * vacuums nothing — never a data-loss fallback. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText, delegate).getOrElse {
      try delegate.parsePlan(sqlText)
      catch {
        // A maintenance statement whose TABLE failed to resolve as a
        // snapshot table delegates (a stacked extension may define it) —
        // but when the delegate can't parse it either, Spark's
        // PARSE_SYNTAX_ERROR would bury the actual problem (a typo'd or
        // unregistered table) under "syntax error at OPTIMIZE". Rethrow
        // with the resolution failure front and center.
        case e: org.apache.spark.sql.catalyst.parser.ParseException
            if GraftSqlParser.isMaintenanceShaped(sqlText) =>
          throw new IllegalArgumentException(
            s"cannot resolve the target of '${sqlText.trim.takeWhile(_ != '\n')}': " +
              "not a registered snapshot table — register(name, root) it or " +
              "address it as graft.`/path` (no other installed parser " +
              "accepts the statement either)", e)
      }
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val optimizeRe = Pattern.compile(
    """^\s*OPTIMIZE\s+(.+?)(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?(?:\s+REBUCKET\s+(\d+))?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val vacuumRe = Pattern.compile(
    """^\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?)?(?:\s+(DRY\s+RUN))?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val cloneRe = Pattern.compile(
    """^\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(.+?)\s+SHALLOW\s+CLONE\s+""" +
      """(.+?)(?:\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+?))?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val restoreRe = Pattern.compile(
    """^\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+?)\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val historyRe = Pattern.compile(
    """^\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val detailRe = Pattern.compile(
    """^\s*DESCRIBE\s+DETAIL\s+(.+?)\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val convertRe = Pattern.compile(
    """^\s*CONVERT\s+TO\s+GRAFT\s+(.+?)(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val copyIntoRe = Pattern.compile(
    """^\s*COPY\s+INTO\s+(.+?)\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+PATTERN\s*=\s*'([^']+)')?(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?""" +
      """(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val quotedKvRe = Pattern.compile("""'([^']*)'\s*=\s*'([^']*)'""")
  private val analyzeRe = Pattern.compile(
    """^\s*ANALYZE\s+TABLE\s+(.+?)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+(.+?)))?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val reorgRe = Pattern.compile(
    """^\s*REORG\s+TABLE\s+(.+?)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val addConstraintRe = Pattern.compile(
    """^\s*ALTER\s+TABLE\s+(.+?)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.*)\)\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val dropConstraintRe = Pattern.compile(
    """^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val syncIdentityRe = Pattern.compile(
    """^\s*ALTER\s+TABLE\s+(.+?)\s+SYNC\s+IDENTITY\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
  private val dropFeatureRe = Pattern.compile(
    """^\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+FEATURE\s+`?(\w+)`?\s*;?\s*$""",
    Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  /** True when the statement LOOKS like one of the graft-only
    * maintenance productions (head-word check only) — used to sharpen
    * the delegate's parse error when resolution fell through. ALTER and
    * CREATE are excluded: Spark owns those heads, so their parse errors
    * are genuine syntax errors. */
  private[sources] def isMaintenanceShaped(sqlText: String): Boolean = {
    val trimmed = sqlText.trim
    val head = trimmed.takeWhile(!_.isWhitespace).toUpperCase(Locale.ROOT)
    val secondWord = trimmed.split("\\s+").lift(1)
    head == "OPTIMIZE" || head == "VACUUM" || head == "RESTORE" ||
      head == "REORG" ||
      (head == "CONVERT" && secondWord.exists(_.equalsIgnoreCase("TO"))) ||
      (head == "COPY" && secondWord.exists(_.equalsIgnoreCase("INTO"))) ||
      (head == "DESCRIBE" && secondWord.exists(w =>
        w.equalsIgnoreCase("HISTORY") || w.equalsIgnoreCase("DETAIL")))
  }

  private[sources] def parseMaintenance(
      sqlText: String, delegate: ParserInterface): Option[LogicalPlan] = {
    val trimmed = sqlText.trim
    val head = trimmed.takeWhile(!_.isWhitespace).toUpperCase(Locale.ROOT)
    val secondWord = trimmed.split("\\s+").lift(1)
    val isHistory = head == "DESCRIBE" &&
      secondWord.exists(_.equalsIgnoreCase("HISTORY"))
    val isDetail = head == "DESCRIBE" &&
      secondWord.exists(_.equalsIgnoreCase("DETAIL"))
    val isCopy = head == "COPY" &&
      secondWord.exists(_.equalsIgnoreCase("INTO"))
    val isAnalyze = head == "ANALYZE" &&
      secondWord.exists(_.equalsIgnoreCase("TABLE"))
    // CREATE is Spark's statement; intercept ONLY the SHALLOW CLONE
    // shape (Spark's own parser has no CLONE production) — every other
    // CREATE delegates untouched
    val isClone = head == "CREATE" &&
      """\bSHALLOW\s+CLONE\b""".r.findFirstIn(trimmed.toUpperCase(Locale.ROOT)).isDefined
    if (head != "OPTIMIZE" && head != "VACUUM" && head != "RESTORE" &&
        head != "CONVERT" && head != "ALTER" && head != "REORG" &&
        !isHistory && !isDetail && !isCopy && !isAnalyze && !isClone)
      return None
    // None (unparseable identifier or a table the registry doesn't
    // know) ⇒ the whole statement delegates untouched, so a session
    // stacking another extension that defines these statements (e.g.
    // Delta) can still reach it — mirroring the ALTER…CONSTRAINT
    // branch's fall-through
    def rootOf(tableText: String): Option[String] =
      try SnapshotSql.rootOf(delegate.parseMultipartIdentifier(tableText.trim))
      catch { case _: Exception => None }
    // ALTER is Spark's statement; intercept ONLY the graft-specific
    // shapes on snapshot tables (the two CONSTRAINT forms — Spark's
    // analyzer refuses constraint DDL for tables carrying the V1
    // streaming fallback — SYNC IDENTITY, and DROP FEATURE) — every
    // other ALTER, and any non-snapshot table, delegates untouched
    if (head == "ALTER") {
      val add = addConstraintRe.matcher(sqlText)
      val drop = dropConstraintRe.matcher(sqlText)
      val sync = syncIdentityRe.matcher(sqlText)
      if (add.matches())
        return rootOf(add.group(1))
          .map(GraftAddConstraintCommand(_, add.group(2), add.group(3)))
      if (drop.matches())
        return rootOf(drop.group(1))
          .map(GraftDropConstraintCommand(_, drop.group(2)))
      if (sync.matches())
        return rootOf(sync.group(1)).map(GraftSyncIdentityCommand(_))
      val dropFeat = dropFeatureRe.matcher(sqlText)
      if (dropFeat.matches())
        return rootOf(dropFeat.group(1))
          .map(GraftDropFeatureCommand(_, dropFeat.group(2)))
      return None
    }
    if (isCopy) {
      val m = copyIntoRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: COPY INTO <table> FROM '<path>' FILEFORMAT = PARQUET|CSV|JSON " +
          "[PATTERN = '<glob>'] [FORMAT_OPTIONS ('k'='v', …)] " +
          "[COPY_OPTIONS ('force'='true')]; got: " + sqlText)
      def kvs(group: Int): Map[String, String] = Option(m.group(group)).map { body =>
        val it = quotedKvRe.matcher(body)
        val b = Map.newBuilder[String, String]
        while (it.find()) b += (it.group(1) -> it.group(2))
        b.result()
      }.getOrElse(Map.empty)
      val copyOpts = kvs(6)
      return rootOf(m.group(1)).map(GraftCopyIntoCommand(_,
        m.group(2), m.group(3).toLowerCase(Locale.ROOT),
        Option(m.group(4)), kvs(5),
        copyOpts.get("force").exists(_.equalsIgnoreCase("true"))))
    }
    if (isAnalyze) {
      // Spark's own ANALYZE targets session-catalog tables; intercept
      // only tables the snapshot registry resolves, delegate the rest
      val m = analyzeRe.matcher(sqlText)
      if (!m.matches()) return None
      val forAll = m.group(2) != null
      val named = Option(m.group(3)).toSeq.flatMap(_.split(',').toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
      return rootOf(m.group(1)).map(GraftAnalyzeCommand(_, forAll, named))
    }
    if (head == "REORG") {
      val m = reorgRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: REORG TABLE <table> APPLY (PURGE); got: " + sqlText)
      return rootOf(m.group(1)).map(GraftReorgCommand(_))
    }
    if (isClone) {
      val m = cloneRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: CREATE TABLE [IF NOT EXISTS] <target> SHALLOW CLONE <source> " +
          "[VERSION|TIMESTAMP AS OF <v>]; got: " + sqlText)
      val ifNotExists = m.group(1) != null
      val asOf = Option(m.group(4)).map { kind =>
        (kind.equalsIgnoreCase("TIMESTAMP"),
          m.group(5).trim.stripPrefix("'").stripSuffix("'"))
      }
      return (rootOf(m.group(2)), rootOf(m.group(3))) match {
        case (Some(target), Some(source)) =>
          Some(GraftCloneCommand(target, source, ifNotExists, asOf))
        case _ => None
      }
    }
    if (isHistory) {
      val m = historyRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: DESCRIBE HISTORY <table>; got: " + sqlText)
      rootOf(m.group(1)).map(GraftHistoryCommand(_))
    } else if (isDetail) {
      val m = detailRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: DESCRIBE DETAIL <table>; got: " + sqlText)
      rootOf(m.group(1)).map(GraftDetailCommand(_))
    } else if (head == "OPTIMIZE") {
      val m = optimizeRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: OPTIMIZE <table> [WHERE <pred>] [ZORDER BY (cols)] " +
          "[REBUCKET <n>]; got: " + sqlText)
      val zorder = Option(m.group(3))
        .map(_.split(',').toSeq.map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
      val rebucket = Option(m.group(4)).map(_.toInt)
      if (rebucket.isDefined && (zorder.isDefined || m.group(2) != null))
        throw new IllegalArgumentException(
          "REBUCKET is a whole-table rewrite — it composes with neither " +
            "WHERE nor ZORDER BY; got: " + sqlText)
      rootOf(m.group(1)).map(GraftOptimizeCommand(_, Option(m.group(2)), zorder, rebucket))
    } else if (head == "CONVERT") {
      val m = convertRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: CONVERT TO GRAFT <table> [PARTITIONED BY (cols)]; got: " + sqlText)
      val partCols = Option(m.group(2)).toSeq.flatMap(_.split(',').toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
      rootOf(m.group(1)).map(GraftConvertCommand(_, partCols))
    } else if (head == "RESTORE") {
      val m = restoreRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: RESTORE [TABLE] <table> TO VERSION|TIMESTAMP AS OF <v>; got: " + sqlText)
      val kind = m.group(2).toUpperCase(Locale.ROOT)
      val spec = m.group(3).trim.stripPrefix("'").stripSuffix("'")
      rootOf(m.group(1)).map(GraftRestoreCommand(_, kind == "TIMESTAMP", spec))
    } else {
      val m = vacuumRe.matcher(sqlText)
      if (!m.matches()) throw new IllegalArgumentException(
        "expected: VACUUM <table> [RETAIN <n> HOURS] [DRY RUN]; got: " + sqlText)
      val retain = Option(m.group(2)).map(_.toDouble).getOrElse(168.0)
      if (m.group(3) != null)
        rootOf(m.group(1)).map(GraftVacuumDryRunCommand(_, retain))
      else
        rootOf(m.group(1)).map(GraftVacuumCommand(_, retain))
    }
  }
}

/** `OPTIMIZE` — returns the committed version (-1 = nothing to do). */
case class GraftOptimizeCommand(
    root: String, where: Option[String], zorder: Option[Seq[String]],
    rebucket: Option[Int] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val target = 128L * 1024 * 1024
    val v = if (rebucket.isDefined) Snapshots.rebucket(session, root, rebucket.get)
    else zorder match {
      case None =>
        // a CLUSTERED table's plain OPTIMIZE re-clusters (incremental
        // no-op when the layout is tight — Delta's clustered-table
        // behavior); unclustered tables bin-pack small files
        if (Snapshots.tableProperties(session, root)
            .get("graft.clusterBy").exists(_.trim.nonEmpty))
          Snapshots.optimizeClustered(session, root,
            targetFileBytes = target, where = where)
        else Snapshots.optimizeCompact(session, root,
          smallerThanBytes = target, targetFileBytes = target, where = where)
      case Some(Seq(a, b)) =>
        Snapshots.optimizeZorderCow(session, root, a, b, where = where)
      case Some(cols) =>
        // 1 or 3+ clustering columns: range-cluster by the list, sized
        // to ~target-byte files
        val qroot = new org.apache.hadoop.fs.Path(root)
        val fs = qroot.getFileSystem(session.sparkContext.hadoopConfiguration)
        val bytes = Snapshots.versionFiles(session, root)
          .map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
        val n = math.max(1, math.ceil(bytes.toDouble / target).toInt)
        Snapshots.optimizeCow(session, root, cols, numFiles = n, where = where)
    }
    Seq(Row(v))
  }
}

/** `CONVERT TO GRAFT t [PARTITIONED BY (cols)]` — adopt an existing
  * parquet directory as a snapshot table in place, zero data movement
  * (Snapshots.convertToSnapshot). */
case class GraftConvertCommand(root: String, partitionBy: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.convertToSnapshot(session, root, partitionBy)))
}

/** `ALTER TABLE t ADD CONSTRAINT n CHECK (p)` — the log's ingest gate:
  * current data validated now, every future batch refused on
  * violation. */
case class GraftAddConstraintCommand(root: String, cname: String, predicateSql: String)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Snapshots.addCheckConstraint(session, root, cname, predicateSql)
    Nil
  }
}

/** `ALTER TABLE t DROP CONSTRAINT n` — metadata-only. */
case class GraftDropConstraintCommand(root: String, cname: String)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Snapshots.dropCheckConstraint(session, root, cname)
    Nil
  }
}

/** `ALTER TABLE t DROP FEATURE f` — the protocol downgrade (Delta's
  * statement): strips the feature from the sticky lists once its live
  * dependence is gone and checkpoints at the drop version; see
  * `Snapshots.dropFeature` for the per-feature preconditions and the
  * vacuum-as-TRUNCATE-HISTORY step. Returns the drop commit's version. */
case class GraftDropFeatureCommand(root: String, feature: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.dropFeature(session, root, feature)))
}

/** `RESTORE [TABLE] t TO VERSION|TIMESTAMP AS OF v` — one commit
  * whose content equals the named version; history stays intact. */
case class GraftRestoreCommand(root: String, byTimestamp: Boolean, spec: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val target =
      if (!byTimestamp) spec.toLong
      else Snapshots.versionAt(session, root,
        spec.toLongOption.getOrElse(java.sql.Timestamp.valueOf(spec).getTime))
    Seq(Row(Snapshots.restore(session, root, target)))
  }
}

/** `DESCRIBE HISTORY t` — one row per committed version, newest first,
  * straight from the delta headers (never a data scan). */
case class GraftHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("commit_ts_ms", LongType, nullable = false)(),
    AttributeReference("op", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("txn", LongType, nullable = false)(),
    AttributeReference("has_feed", org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("carries_schema", org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Snapshots.history(session, root).collect().toSeq
}

/** `DESCRIBE DETAIL t` — the table's physical summary in one row from
  * the log + one file-status listing (Delta's spelling, the columns an
  * operator actually uses): format, location, head version, commit
  * time, partition/clustering columns, numFiles, sizeInBytes, numRows
  * (null when deletion vectors make envelope rows an over-count), and
  * the table properties as JSON. Never a data scan. */
case class GraftDetailCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("location", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("last_modified_ms", LongType, nullable = false)(),
    AttributeReference("partition_columns", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("clustering_columns", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = true)(),
    AttributeReference("properties_json", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("min_reader_version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("min_writer_version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
    AttributeReference("reader_features", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("writer_features", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val v = Snapshots.latestVersion(session, root)
    val props = Snapshots.tableProperties(session, root, v)
    val qroot = new org.apache.hadoop.fs.Path(root)
    val fs = qroot.getFileSystem(session.sparkContext.hadoopConfiguration)
    val files = Snapshots.versionFiles(session, root, v)
    val size = files.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val propsJson = props.toSeq.sorted
      .map { case (k, w) =>
        s""""${k.replace("\"", "\\\"")}":"${w.replace("\"", "\\\"")}"""" }
      .mkString("{", ",", "}")
    val (minR, minW, rfeat, wfeat) = Snapshots.protocol(session, root, v)
    Seq(Row(
      "graft", root, v, Snapshots.commitTimestamp(session, root, v),
      graft.core.HivePartitions.columnsOf(props).mkString(","),
      props.getOrElse("graft.clusterBy", ""),
      files.size.toLong, size,
      Snapshots.rowCount(session, root, v).map(Long.box).orNull,
      propsJson, minR, minW, rfeat.mkString(","), wfeat.mkString(",")))
  }
}

/** `VACUUM` — returns the number of files deleted. Retention maps to
  * versions through commit timestamps: every version a reader anchored
  * within the window could see is kept.
  *
  * A retention below the 168-hour default is REFUSED unless
  * `spark.graft.vacuum.retentionCheck.enabled=false` (Delta's guard):
  * a short window deletes files that concurrently pinned snapshots and
  * time travel still reference — the operator must opt into that risk
  * explicitly, never reach it by typo. */
case class GraftVacuumCommand(root: String, retainHours: Double)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("files_deleted", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    GraftVacuumCommand.checkRetention(session, retainHours)
    val keepFrom = GraftVacuumCommand.keepFromOf(session, root, retainHours)
    Seq(Row(Snapshots.vacuum(session, root, keepFrom).toLong))
  }
}

object GraftVacuumCommand {
  private[sources] def checkRetention(session: SparkSession, retainHours: Double): Unit = {
    val checkOn = !session.conf
      .getOption("spark.graft.vacuum.retentionCheck.enabled").contains("false")
    if (checkOn && retainHours < 168.0)
      throw new IllegalArgumentException(
        f"VACUUM RETAIN $retainHours%.1f HOURS is below the 168-hour " +
          "default — in-flight readers and time travel may still reference " +
          "the files it would delete. Set " +
          "spark.graft.vacuum.retentionCheck.enabled=false to override.")
  }
  private[sources] def keepFromOf(
      session: SparkSession, root: String, retainHours: Double): Long = {
    val cutoff = System.currentTimeMillis() - (retainHours * 3600 * 1000).toLong
    try Snapshots.versionAt(session, root, cutoff)
    catch { case _: IllegalArgumentException => 0L } // younger than window
  }
}

/** `ALTER TABLE t SYNC IDENTITY` — recompute identity high-water marks
  * from the table's actual data (after explicit inserts past the hwm —
  * GENERATED BY DEFAULT admits them). Metadata-grain: stats envelopes
  * answer when every live file carries one. One row per advanced
  * column; zero rows = already in sync. */
case class GraftSyncIdentityCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("hwm", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Snapshots.syncIdentity(session, root).map { case (c, b) => Row(c, b) }
}

/** `REORG TABLE t APPLY (PURGE)` — Delta's spelling for folding live
  * deletion vectors into a rewrite: files holding any DV'd row are
  * rewritten without those rows (content-preserving — same logical
  * rows), everything else carries by reference, and the head's DV list
  * empties, reclaiming the per-read anti-join. Returns the committed
  * version, -1 when the table carries no vectors. */
case class GraftReorgCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(Snapshots.materializeDeletionVectors(session, root)))
}

/** `VACUUM t [RETAIN n HOURS] DRY RUN` — one row per data file the
  * matching real VACUUM would delete (absolute path, sorted), ZERO side
  * effects: no deletion, no floor checkpoint, log untouched. Same
  * retention guard as the real statement — a dry run under an unsafe
  * retention should fail the same way the real run would, not preview a
  * deletion the guard will refuse. */
case class GraftVacuumDryRunCommand(root: String, retainHours: Double)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    GraftVacuumCommand.checkRetention(session, retainHours)
    val keepFrom = GraftVacuumCommand.keepFromOf(session, root, retainHours)
    Snapshots.vacuumPlan(session, root, keepFrom).map(Row(_))
  }
}

/** `CREATE TABLE t SHALLOW CLONE s [VERSION|TIMESTAMP AS OF v]` — a
  * zero-copy branch of the source at the named (default: head) version:
  * the clone's log references the source's data files by absolute path;
  * no data moves. `IF NOT EXISTS` makes an already-initialised target a
  * no-op (returns its current head) instead of an error. */
case class GraftCloneCommand(
    targetRoot: String, sourceRoot: String, ifNotExists: Boolean,
    asOf: Option[(Boolean, String)])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    if (ifNotExists && Snapshots.versions(session, targetRoot).nonEmpty)
      return Seq(Row(Snapshots.latestVersion(session, targetRoot)))
    val version = asOf.map {
      case (false, spec) => spec.toLong
      case (true, spec) => Snapshots.versionAt(session, sourceRoot,
        spec.toLongOption.getOrElse(java.sql.Timestamp.valueOf(spec).getTime))
    }
    Seq(Row(Snapshots.cloneShallow(session, sourceRoot, targetRoot, version)))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b | FOR ALL
  * COLUMNS]` — one aggregate pass computes per-column NDV / null count
  * / min / max (Snapshots.analyzeColumns) and records them as table
  * properties; every subsequent catalog read surfaces them to Catalyst
  * as `CatalogStatistics.colStats`, so CBO join reorder and
  * selectivity estimates between snapshot tables use real numbers.
  * Plain `COMPUTE STATISTICS` (no FOR clause) is already answered by
  * the log (size + row count ride every catalog read) — it validates
  * the table and returns zero column rows. Returns one row per
  * analyzed column. */
case class GraftAnalyzeCommand(
    root: String, forAll: Boolean, columns: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("ndv", LongType, nullable = false)(),
    AttributeReference("null_count", LongType, nullable = false)(),
    AttributeReference("min", org.apache.spark.sql.types.StringType, nullable = true)(),
    AttributeReference("max", org.apache.spark.sql.types.StringType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    val cols =
      if (forAll) Snapshots.versionSchema(session, root)
        .map(_.fields.toSeq.map(_.name))
        .getOrElse(Snapshots.readVersion(session, root).columns.toSeq)
      else columns
    if (cols.isEmpty) { Snapshots.latestVersion(session, root); return Nil }
    val stats = Snapshots.analyzeColumns(session, root, cols)
    cols.sorted.map { c =>
      val s = stats(c)
      Row(c, s.ndv, s.nullCount, s.min.orNull, s.max.orNull)
    }
  }
}

/** `COPY INTO t FROM '<path>' FILEFORMAT = … [PATTERN = …]
  * [FORMAT_OPTIONS (…)] [COPY_OPTIONS ('force'='true')]` — idempotent
  * landing-zone ingest (Snapshots.copyInto): every source file loads
  * exactly once; re-runs skip what already landed. Returns the loaded /
  * skipped file counts, the rows inserted, and the committed version
  * (unchanged head when nothing was new). */
case class GraftCopyIntoCommand(
    root: String, from: String, format: String, pattern: Option[String],
    formatOptions: Map[String, String], force: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_loaded", LongType, nullable = false)(),
    AttributeReference("files_skipped", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val r = Snapshots.copyInto(session, root, from, format, pattern,
      formatOptions, force)
    Seq(Row(r.filesLoaded, r.filesSkipped, r.rowsInserted, r.version))
  }
}
