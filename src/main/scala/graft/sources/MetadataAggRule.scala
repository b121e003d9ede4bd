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

  /** The envelope facts the rewrite consults — two sources: the
    * driver-held stats index (text-codec tables), or ONE distributed
    * aggregate over the parquet checkpoint's rows (so a 10⁶-file
    * metadata-only COUNT/MIN/MAX never materializes the index in
    * driver heap). Contracts per method: outer None = not answerable
    * (leave the scan); inner None on bounds = provably value-free
    * everywhere (the SQL answer is NULL). */
  private sealed trait Envelopes {
    def totalRows: Long
    def nonNull(c: String): Option[Long]
    def longBound(c: String, isMin: Boolean): Option[Option[Long]]
    def dblBound(c: String, isMin: Boolean): Option[Option[Double]]
  }

  private final class DriverEnvelopes(
      stats: Seq[graft.core.Skipping.FileStats]) extends Envelopes {
    val totalRows: Long = stats.map(_.rows).sum
    private def valueFree(f: graft.core.Skipping.FileStats, c: String) =
      f.rows == 0L || f.nullCounts.get(c).contains(f.rows)
    def nonNull(c: String): Option[Long] =
      if (stats.forall(f => f.nullCounts.contains(c) || f.rows == 0L))
        Some(stats.map(f => f.rows - f.nullCounts.getOrElse(c, 0L)).sum)
      else None
    def longBound(c: String, isMin: Boolean): Option[Option[Long]] = {
      if (!stats.forall(f => f.mins.contains(c) || valueFree(f, c))) return None
      val vs = stats.flatMap(f => (if (isMin) f.mins else f.maxs).get(c))
      Some(if (vs.isEmpty) None else Some(if (isMin) vs.min else vs.max))
    }
    def dblBound(c: String, isMin: Boolean): Option[Option[Double]] = {
      if (!stats.forall(f => f.dmins.contains(c) || valueFree(f, c))) return None
      val vs = stats.flatMap(f => (if (isMin) f.dmins else f.dmaxs).get(c))
      Some(if (vs.isEmpty) None else Some(if (isMin) vs.min else vs.max))
    }
  }

  private final class SummaryEnvelopes(
      s: Snapshots.EnvelopeSummary) extends Envelopes {
    val totalRows: Long = s.totalRows
    def nonNull(c: String): Option[Long] = s.cols.get(c).flatMap(_.nonNullRows)
    def longBound(c: String, isMin: Boolean): Option[Option[Long]] =
      s.cols.get(c).flatMap(_.longBounds)
        .map(b => if (isMin) b._1 else b._2)
    def dblBound(c: String, isMin: Boolean): Option[Option[Double]] =
      s.cols.get(c).flatMap(_.dblBounds)
        .map(b => if (isMin) b._1 else b._2)
  }

  private def rewrite(
      agg: Aggregate, aggExprs: Seq[NamedExpression],
      idx: SnapshotFileIndex): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val root = idx.root; val version = idx.version
    if (Snapshots.liveDeletionVectors(spark, root, version).nonEmpty) return None
    val physMap = Snapshots.versionSchema(spark, root, version)
      .map(Snapshots.physicalMap).getOrElse(Map.empty[String, String])
    def phys(c: String) = physMap.getOrElse(c, c)
    // SHAPE gate before any envelope work: unless every output column is
    // a literal or a COUNT/MIN/MAX the envelopes could possibly answer
    // (non-distinct, unfiltered, over an exactly-enveloped type), bail
    // without launching the distributed summary — otherwise every
    // unanswerable unfiltered aggregate (SUM/AVG/stddev/…) on a parquet-
    // checkpoint table would pay a checkpoint-scan Spark job at planning
    // time for an answer that is always "leave the plan alone".
    val exactTypes: Set[DataType] = Set(
      ByteType, ShortType, IntegerType, LongType, DateType, TimestampType,
      DoubleType, FloatType)
    val shapeOk = aggExprs.forall {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => true
          case Count(Seq(_: AttributeReference)) => true
          case Min(a: AttributeReference) => exactTypes.contains(a.dataType)
          case Max(a: AttributeReference) => exactTypes.contains(a.dataType)
          case _ => false
        }
      case Alias(_: Literal, _) => true
      case _ => false
    }
    if (!shapeOk) return None
    // the columns the aggregate touches, physical names
    val needed = aggExprs.flatMap(_.collect {
      case a: AttributeReference => phys(a.name) }).distinct
    // parquet-checkpoint tables: one distributed pass over the
    // checkpoint rows; the allStats flag IS the stats-missing gate.
    // Otherwise the driver index (with its own gate).
    val env: Envelopes =
      Snapshots.distributedEnvelopeSummary(spark, root, version, needed) match {
        case Some(s) => if (!s.allStats) return None else new SummaryEnvelopes(s)
        case None =>
          if (Snapshots.statsMissingFromLog(spark, root, version).nonEmpty)
            return None
          new DriverEnvelopes(Snapshots.statsIndex(spark, root, version))
      }

    def answer(e: Expression): Option[Any] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => Some(env.totalRows)
          case Count(Seq(a: AttributeReference)) => env.nonNull(phys(a.name))
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
      a.dataType match {
        case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType =>
          env.longBound(c, isMin).map(_.map { v =>
            a.dataType match {
              case ByteType => v.toByte
              case ShortType => v.toShort
              case IntegerType | DateType => v.toInt
              case _ => v
            }
          })
        case DoubleType => env.dblBound(c, isMin).map(identity)
        case FloatType => env.dblBound(c, isMin).map(_.map(_.toFloat))
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
      "(envelope metadata only, zero data files scanned)")
    Some(LocalRelation(agg.output.map(_.toAttribute), Seq(InternalRow(values: _*))))
  }
}
