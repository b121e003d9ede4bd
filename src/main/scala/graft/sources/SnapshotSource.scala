package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
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
  *     .option("changesFrom", 0).option("changesTo", 2)   // CDC replay
  *     .load(root)
  * }}}
  *
  * Implemented as a DSv1 `PrunedFilteredScan` that DELEGATES to the
  * snapshot read (which plans from the version's explicit file list — no
  * directory listing): required columns and supported predicates are
  * re-applied to the delegate DataFrame, so projection and filters reach
  * the underlying parquet scan (`PushedFilters`) instead of dying at the
  * RDD boundary a plain `TableScan` would create. Predicates outside the
  * translatable set are returned to Spark for evaluation above — never
  * dropped. */
class SnapshotSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshot source needs a path: .load(root)"))
    val spark = sqlContext.sparkSession
    val delegate: DataFrame = (parameters.get("changesfrom"), parameters.get("changesto")) match {
      case (Some(a), Some(b)) =>
        Snapshots.changesBetween(spark, root, a.toLong, b.toLong)
      case (None, None) =>
        val v = parameters.get("versionasof").map(_.toLong).getOrElse(-1L)
        Snapshots.readVersion(spark, root, v)
      case _ =>
        throw new IllegalArgumentException(
          "changesFrom and changesTo must be set together")
    }
    new SnapshotRelation(sqlContext, delegate)
  }
}

private[sources] class SnapshotRelation(
    val sqlContext: SQLContext, delegate: DataFrame)
  extends BaseRelation with PrunedFilteredScan {

  override def schema: StructType = delegate.schema

  /** Filters re-expressed on the delegate reach its parquet scan; the
    * rest are Spark's to re-check (returning them from `unhandledFilters`
    * keeps the contract honest). */
  private def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
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

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => translate(f).isEmpty)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(translate)
      .foldLeft(delegate)((df, c) => df.where(c))
    val projected =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}
