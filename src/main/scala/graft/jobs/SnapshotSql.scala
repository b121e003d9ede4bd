package graft.jobs

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._

/** SQL DML on the snapshot log — `MERGE INTO` / `UPDATE` / `DELETE FROM`
  * / `INSERT INTO` statements routed to the log's own commit paths
  * (`mergeCow` / `updateWhere` / `deleteWhere` / `append`), so a SQL-only
  * consumer gets the identical commits, change feeds, OCC semantics and
  * CHECK gating the programmatic API gives.
  *
  * Spark-first by construction: the statement is parsed by SPARK'S OWN
  * ANSI parser (`sessionState.sqlParser.parsePlan`) into the catalyst
  * DML nodes (`MergeIntoTable`, `UpdateTable`, `DeleteFromTable`,
  * `InsertIntoStatement`) — no second grammar — and this router only
  * binds their table references to snapshot roots and dispatches. Two
  * spellings name a table:
  *
  *   - `` graft.`/abs/path/to/table` `` — path-addressed, Delta's
  *     ``delta.`/path` `` convention;
  *   - a name registered once via `SnapshotSql.register(spark, "t", root)`.
  *
  * A MERGE source may be any SQL relation (temp view, subquery) and may
  * itself name a snapshot table in either spelling — references are
  * substituted with the log's read plan before analysis.
  *
  * Supported shapes (anything else fails loudly, never silently bends):
  *   - `MERGE INTO t USING s ON t.k = s.k [AND …] WHEN MATCHED THEN
  *     UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — the whole-row
  *     upsert `mergeCow` implements; the ON clause must be a
  *     conjunction of same-name column equalities (they become the
  *     merge keys).
  *   - `UPDATE t SET c = e, … [WHERE p]`
  *   - `DELETE FROM t WHERE p`
  *   - `INSERT INTO t <query>`
  *
  * Returns the committed version. `changeFeed = true` publishes the
  * same row-level feeds as the API calls (the SQL and API routes are
  * oracle-checked to produce identical table hashes AND identical
  * feeds — `sql_merge_dml`). */
object SnapshotSql {

  private val registry = TrieMap.empty[String, String]

  /** Bind `name` (case-insensitive) to a snapshot root for this JVM. */
  def register(name: String, root: String): Unit =
    registry.put(name.toLowerCase(java.util.Locale.ROOT), root)

  def unregister(name: String): Unit =
    registry.remove(name.toLowerCase(java.util.Locale.ROOT))

  /** The snapshot root a multipart identifier names, if any. */
  private def rootOf(parts: Seq[String]): Option[String] = parts match {
    case Seq(catalog, path) if catalog.equalsIgnoreCase("graft") => Some(path)
    case Seq(name) => registry.get(name.toLowerCase(java.util.Locale.ROOT))
    case _ => None
  }

  /** (root, alias-names) of a DML target plan: the parser wraps an
    * aliased target in `SubqueryAlias`. */
  private def targetOf(plan: LogicalPlan): (String, Set[String]) = plan match {
    case SubqueryAlias(ident, child) =>
      val (root, names) = targetOf(child)
      (root, names + ident.name)
    case u: UnresolvedRelation =>
      val root = rootOf(u.multipartIdentifier).getOrElse(throw new IllegalArgumentException(
        s"not a snapshot table: ${u.multipartIdentifier.mkString(".")} — " +
          "register(name, root) it or address it as graft.`/path`"))
      (root, Set(u.multipartIdentifier.last, u.multipartIdentifier.mkString(".")))
    case other => throw new IllegalArgumentException(
      s"unsupported DML target shape: ${other.nodeName}")
  }

  /** Strip the target's alias qualifier from attribute references so the
    * predicate/SET text re-resolves against the bare table frame
    * (`t.k < 5` → `k < 5`). */
  private def unqualify(e: Expression, aliases: Set[String]): Expression =
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.size > 1 &&
          aliases.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  /** Substitute snapshot-table references inside a SOURCE plan with the
    * log's read plan, so `USING graft.`/path`` and registered names work
    * as merge sources without a metastore. */
  private def substituted(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val sub = plan.transform {
      case u: UnresolvedRelation if rootOf(u.multipartIdentifier).isDefined =>
        Snapshots.readVersion(spark, rootOf(u.multipartIdentifier).get)
          .queryExecution.logical
    }
    org.apache.spark.sql.classic.GraftSqlShim.ofRows(spark, sub)
  }

  /** Merge keys from the ON clause: a conjunction of same-name column
    * equalities (`t.k = s.k AND t.d = s.d`). */
  private def mergeKeys(cond: Expression): Seq[String] = cond match {
    case And(l, r) => mergeKeys(l) ++ mergeKeys(r)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
      Seq(a.nameParts.last)
    case other => throw new IllegalArgumentException(
      s"MERGE ON must be a conjunction of same-name column equalities " +
        s"(t.k = s.k); got: ${other.sql}")
  }

  /** Execute one DML statement against the log; returns the committed
    * version. `morDelete = true` routes DELETE through the
    * merge-on-read path (`deleteWhereMor` — deletion vector, zero file
    * rewrites) instead of the copy-on-write rewrite; everything else is
    * identical, including the change feed. */
  def sql(spark: SparkSession, text: String, changeFeed: Boolean = false,
      morDelete: Boolean = false): Long =
    spark.sessionState.sqlParser.parsePlan(text) match {

      case d: DeleteFromTable =>
        val (root, aliases) = targetOf(d.table)
        val pred = unqualify(d.condition, aliases).sql
        if (morDelete) Snapshots.deleteWhereMor(spark, root, pred, changeFeed = changeFeed)
        else Snapshots.deleteWhere(spark, root, pred, changeFeed = changeFeed)

      case u: UpdateTable =>
        val (root, aliases) = targetOf(u.table)
        val set = u.assignments.map { a =>
          val name = a.key match {
            case k: UnresolvedAttribute => unqualify(k, aliases) match {
              case k2: UnresolvedAttribute => k2.nameParts.mkString(".")
              case other => other.sql
            }
            case other => throw new IllegalArgumentException(
              s"unsupported SET target: ${other.sql}")
          }
          name -> unqualify(a.value, aliases).sql
        }.toMap
        val pred = u.condition.map(unqualify(_, aliases).sql).getOrElse("true")
        Snapshots.updateWhere(spark, root, set, pred, changeFeed = changeFeed)

      case m: MergeIntoTable =>
        val (root, _) = targetOf(m.targetTable)
        val keys = mergeKeys(m.mergeCondition).distinct
        def unsupported(what: String): Nothing = throw new IllegalArgumentException(
          s"unsupported MERGE shape ($what) — the log implements the whole-row " +
            "upsert: WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
        m.matchedActions match {
          case Seq(UpdateStarAction(None)) => ()
          case other => unsupported(s"matched actions: $other")
        }
        m.notMatchedActions match {
          case Seq(InsertStarAction(None)) => ()
          case other => unsupported(s"not-matched actions: $other")
        }
        if (m.notMatchedBySourceActions.nonEmpty)
          unsupported("WHEN NOT MATCHED BY SOURCE")
        Snapshots.mergeCow(spark, root, substituted(spark, m.sourceTable),
          keys, changeFeed = changeFeed)

      case i: InsertIntoStatement =>
        val (root, _) = targetOf(i.table)
        require(!i.overwrite, "INSERT OVERWRITE is not routed — use " +
          "Snapshots.overwrite / replaceWhere (partition-grain) explicitly")
        require(i.partitionSpec.isEmpty && i.userSpecifiedCols.isEmpty,
          "INSERT INTO with PARTITION/column lists is not supported")
        Snapshots.append(spark, root, substituted(spark, i.query))

      case other => throw new IllegalArgumentException(
        s"not a DML statement this router handles: ${other.nodeName} — " +
          "reads go through spark.sql over a graft-snapshot view")
    }
}
