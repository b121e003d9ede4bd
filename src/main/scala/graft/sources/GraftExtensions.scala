package graft.sources

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OverwritePartitionsDynamic}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.jobs.Snapshots

/** `spark.sql.extensions` hook completing the DSv2 catalog
  * (`GraftCatalog`): the catalog hands the analyzer lightweight
  * metadata `GraftTable`s; these rules bind them to the engine's actual
  * plans — the Delta integration shape.
  *
  *   - `GraftRelationRule` (resolution): every READ of a catalog table
  *     (`DataSourceV2Relation` over a `GraftTable`) becomes the native
  *     V1 relation — `HadoopFsRelation` over `SnapshotFileIndex`, the
  *     SAME object every other front door plans — keeping the original
  *     output attribute ids so references above stay bound. Write nodes
  *     hold their target as a FIELD, not a child, so only reads
  *     rewrite; appends/overwrites flow through the table's own
  *     `V1Write` fallback.
  *   - `GraftDynamicOverwriteRule` (post-hoc resolution): Spark has no
  *     V1 fallback exec for `OverwritePartitionsDynamic`, so
  *     `INSERT OVERWRITE` in dynamic-partition mode is swapped for an
  *     eager command calling `Snapshots.overwritePartitions` — the
  *     log's one-commit dynamic partition overwrite. By post-hoc time
  *     the query side is already column-aligned to the table schema.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => GraftRelationRule(spark))
    ext.injectPostHocResolutionRule(spark => GraftDynamicOverwriteRule(spark))
  }
}

case class GraftRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperatorsDown {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      LogicalRelation(r.table.asInstanceOf[GraftTable].hadoopFsRelation,
        r.output, None, isStreaming = false, stream = None)
  }
}

case class GraftDynamicOverwriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case o: OverwritePartitionsDynamic
        if o.query.resolved && o.table.isInstanceOf[DataSourceV2Relation] &&
          o.table.asInstanceOf[DataSourceV2Relation].table.isInstanceOf[GraftTable] =>
      GraftDynamicOverwriteCommand(
        o.table.asInstanceOf[DataSourceV2Relation].table.asInstanceOf[GraftTable].root,
        o.query)
  }
}

/** Eager dynamic-partition `INSERT OVERWRITE` — one
  * `overwritePartitions` commit (replace exactly the partitions present
  * in the query result, leave the rest untouched). */
case class GraftDynamicOverwriteCommand(root: String, query: LogicalPlan)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.classic.GraftSqlShim.ofRows(session, query)
    // dynamic mode on an unpartitioned table degenerates to a full
    // overwrite (Spark plans OverwritePartitionsDynamic either way)
    if (Snapshots.partitionColumns(session, root).isEmpty)
      Snapshots.overwrite(session, root, df)
    else Snapshots.overwritePartitions(session, root, df)
    Nil
  }
}
