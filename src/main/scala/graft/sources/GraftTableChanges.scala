package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.lit
import org.apache.spark.unsafe.types.UTF8String

import graft.jobs.{Snapshots, SnapshotSql}

/** `table_changes('<table>', <start> [, <end>])` — the CDC range as a
  * SQL table-valued function (Delta's spelling), registered through
  * `SparkSessionExtensions.injectTableFunction` so it composes with the
  * whole SQL surface (`SELECT … FROM table_changes(…) WHERE … GROUP BY
  * …`, joins, CTEs) with zero ceremony.
  *
  * Arguments:
  *   - table: a string the registry resolves — `'name'` (registered) or
  *     `'graft.`/path`'`.
  *   - start / end: version numbers (inclusive on both ends, Delta's
  *     convention), or timestamp strings — start maps to the first
  *     version committed at-or-after it, end to the version live at it.
  *     `end` omitted = the head version.
  *
  * Output: the underlying `Snapshots.changesBetween` frame — row columns
  * + `_op` (insert / update_preimage / update_postimage / delete) —
  * plus `_commit_version`, so a consumer can replay in commit order.
  * Schemas may evolve across the range; frames union by name.
  *
  * 100 TB: resolution cost is O(versions in range) delta-header reads
  * (memoized per immutable `(root, version)`); the data cost is the
  * feeds' own size — a daily merge touching 0.1% of rows yields a feed
  * 1000× smaller than the table, and this function is how SQL-only
  * consumers read it. */
object GraftTableChanges {

  /** The (identifier, info, builder) triple `injectTableFunction`
    * wants. The builder runs during analysis on the driver with the
    * active session in scope — same admission as Delta's CDC TVF. */
  def description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("table_changes"),
      new ExpressionInfo(getClass.getName.stripSuffix("$"), "table_changes"),
      (args: Seq[Expression]) => plan(args))

  private def plan(args: Seq[Expression]): LogicalPlan = {
    if (args.size < 2 || args.size > 3) throw new IllegalArgumentException(
      "table_changes expects (table, start [, end]) — version numbers or " +
        s"timestamp strings; got ${args.size} arguments")
    val spark = SparkSession.active
    def evalOf(e: Expression): Any = {
      if (!e.foldable) throw new IllegalArgumentException(
        s"table_changes arguments must be literals; got: ${e.sql}")
      e.eval()
    }
    val tableName = evalOf(args.head) match {
      case u: UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"table_changes: first argument must be a table name string; got $other")
    }
    val root = SnapshotSql.rootOf(
        spark.sessionState.sqlParser.parseMultipartIdentifier(tableName))
      .getOrElse(throw new IllegalArgumentException(
        s"table_changes: not a snapshot table: $tableName — register(name, " +
          "root) it or address it as graft.`/path`"))
    def boundOf(e: Expression, isStart: Boolean): Long = evalOf(e) match {
      case n: java.lang.Number => n.longValue()
      case s: UTF8String =>
        val ts = java.sql.Timestamp.valueOf(s.toString).getTime
        if (isStart) Snapshots.versionAtOrAfter(spark, root, ts)
        else Snapshots.versionAt(spark, root, ts)
      case other => throw new IllegalArgumentException(
        "table_changes: start/end must be a version number or a " +
          s"timestamp string; got $other")
    }
    val fromV = boundOf(args(1), isStart = true)
    val toV =
      if (args.size == 3) boundOf(args(2), isStart = false)
      else Snapshots.latestVersion(spark, root)
    if (fromV > toV) throw new IllegalArgumentException(
      s"table_changes: empty version range [$fromV, $toV] for $tableName")
    changes(spark, root, fromV, toV).queryExecution.analyzed
  }

  /** Changes of versions `[fromV, toV]` (both inclusive), each commit's
    * frame stamped with its `_commit_version` AND `_commit_timestamp`
    * (Delta's CDC contract carries both). The timestamp is the commit's
    * IN-COMMIT `#ts:` header — strictly increasing by construction and
    * immune to log-file mtime skew — so replay order, windowing, and
    * downstream `timestampAsOf` anchoring are deterministic. */
  def changes(spark: SparkSession, root: String, fromV: Long, toV: Long): DataFrame = {
    // the loud guard `changesBetween` gave the batch door before it
    // routed here — an inverted range must never surface as
    // `empty.reduce`
    require(fromV <= toV, s"empty change range [$fromV, $toV]")
    (fromV to toV).map { v =>
      Snapshots.changesBetween(spark, root, v - 1, v)
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp",
          org.apache.spark.sql.functions.timestamp_millis(
            lit(Snapshots.commitTimestamp(spark, root, v))))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
