package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.jobs.Snapshots

/** METADATA-ONLY AGGREGATES — Delta's OptimizeMetadataOnlyQuery shape
  * for the snapshot log: an UNFILTERED global `COUNT(*)` / `COUNT(col)`
  * / `MIN(col)` / `MAX(col)` over a snapshot relation is answered from
  * the log's write-time `#stats:` envelopes (rows, per-column min/max,
  * null counts) instead of scanning data. At 100 TB the difference is a
  * table scan vs an O(log) metadata read that planning already paid.
  *
  * Answerability is PROVEN per query, never assumed:
  *   - the version carries NO live deletion vectors (DV'd rows are
  *     still counted inside file envelopes — an answer would over-count);
  *   - every live file's stats rode the log (`statsMissingFromLog`
  *     empty — guaranteed for tables written by this engine);
  *   - `COUNT(col)` needs the column's null count in EVERY file;
  *   - `MIN/MAX(col)` needs the column's envelope in every file that
  *     can hold a non-null value (all-null files contribute nothing);
  *     admitted for the EXACT envelope families only — integral
  *     (int/long/date/timestamp-micros — internal forms match the
  *     envelope space) and double (NaN-holding files carry no envelope,
  *     so their presence soundly bails the rewrite). STRING bounds are
  *     16-byte TRUNCATED — inexact by design — and never answer.
  *
  * Anything unanswerable leaves the plan untouched; the scan runs. */
object MetadataAggRule extends Rule[LogicalPlan] {

  /** Install into `spark.experimental.extraOptimizations` once. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) =>
      indexUnder(child) match {
        case Some(idx) => rewrite(agg, aggExprs, idx).getOrElse(agg)
        case None => agg
      }
  }

  /** The snapshot index under an optional column-pruning Project — any
    * Filter/join/other node in between disqualifies (a filter changes
    * every aggregate's value). */
  private def indexUnder(p: LogicalPlan): Option[SnapshotFileIndex] = p match {
    case Project(projectList, l: LogicalRelation)
        if projectList.forall(_.isInstanceOf[AttributeReference]) => indexOf(l)
    case l: LogicalRelation => indexOf(l)
    case _ => None
  }

  private def indexOf(l: LogicalRelation): Option[SnapshotFileIndex] =
    l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case i: SnapshotFileIndex => Some(i)
        case _ => None
      }
      case _ => None
    }

  private def rewrite(
      agg: Aggregate, aggExprs: Seq[NamedExpression],
      idx: SnapshotFileIndex): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val root = idx.root; val version = idx.version
    if (Snapshots.liveDeletionVectors(spark, root, version).nonEmpty) return None
    if (Snapshots.statsMissingFromLog(spark, root, version).nonEmpty) return None
    val stats = Snapshots.statsIndex(spark, root, version)
    val physMap = Snapshots.versionSchema(spark, root, version)
      .map(Snapshots.physicalMap).getOrElse(Map.empty[String, String])
    def phys(c: String) = physMap.getOrElse(c, c)
    val totalRows = stats.map(_.rows).sum

    def answer(e: Expression): Option[Any] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => Some(totalRows)
          case Count(Seq(a: AttributeReference)) =>
            val c = phys(a.name)
            if (stats.forall(f => f.nullCounts.contains(c) || f.rows == 0L))
              Some(stats.map(f => f.rows - f.nullCounts.getOrElse(c, 0L)).sum)
            else None
          case Min(a: AttributeReference) => bound(a, isMin = true)
          case Max(a: AttributeReference) => bound(a, isMin = false)
          case _ => None
        }
      case _ => None
    }

    /** Exact global MIN/MAX from file envelopes — every file must
      * contribute an envelope or be provably value-free (all null /
      * zero rows) on the column; internal forms (days, micros, raw
      * ints, doubles) are exactly the envelope spaces. */
    def bound(a: AttributeReference, isMin: Boolean): Option[Option[Any]] = {
      val c = phys(a.name)
      def valueFree(f: graft.core.Skipping.FileStats): Boolean =
        f.rows == 0L || f.nullCounts.get(c).contains(f.rows)
      a.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType =>
          if (!stats.forall(f => f.mins.contains(c) || valueFree(f))) return None
          val vs = stats.flatMap(f => (if (isMin) f.mins else f.maxs).get(c))
          val raw: Option[Long] = if (vs.isEmpty) None else Some(if (isMin) vs.min else vs.max)
          Some(raw.map { v =>
            a.dataType match {
              case ByteType => v.toByte
              case ShortType => v.toShort
              case IntegerType | DateType => v.toInt
              case _ => v
            }
          })
        case DoubleType =>
          if (!stats.forall(f => f.dmins.contains(c) || valueFree(f))) return None
          val vs = stats.flatMap(f => (if (isMin) f.dmins else f.dmaxs).get(c))
          Some(if (vs.isEmpty) None else Some(if (isMin) vs.min else vs.max))
        case FloatType =>
          if (!stats.forall(f => f.dmins.contains(c) || valueFree(f))) return None
          val vs = stats.flatMap(f => (if (isMin) f.dmins else f.dmaxs).get(c))
          Some(if (vs.isEmpty) None else Some((if (isMin) vs.min else vs.max).toFloat))
        case _ => None // strings are truncated (inexact); others unindexed
      }
    }

    // every output column must be answerable: an aliased aggregate or a literal
    val values = aggExprs.map {
      case Alias(child, _) => child match {
        case ae: AggregateExpression => answer(ae) match {
          case Some(v: Option[Any @unchecked]) => v.orNull // min/max: None = null result
          case Some(v) => v
          case None => return None
        }
        case lit: Literal => lit.value
        case _ => return None
      }
      case _ => return None
    }
    logInfo(s"answering aggregate over $root@v$version from log statistics " +
      s"(${stats.size} file envelopes, zero data files scanned)")
    Some(LocalRelation(agg.output.map(_.toAttribute), Seq(InternalRow(values: _*))))
  }
}
