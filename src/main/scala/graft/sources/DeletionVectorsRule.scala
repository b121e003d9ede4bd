package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, GetStructField}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.jobs.Snapshots

/** Optimizer rule keeping the NATIVE scan path for snapshot versions
  * that carry merge-on-read deletion vectors: a bare
  * `LogicalRelation(HadoopFsRelation(SnapshotFileIndex))` over a
  * DV-carrying version is rewritten into
  *
  * {{{ Project(original output)(
  *       scan+_metadata  ⟕̸(anti, BROADCAST)  dv-sidecar relation
  *         ON _metadata.file_path = dv.file_path
  *        AND _metadata.row_index = dv.row_index) }}}
  *
  * so deleted rows are filtered by the scan's OWN row positions with
  * vectorized reads, whole-stage codegen and row-group pushdown fully
  * intact — the plan-injection shape Delta's DV reads use, expressed as
  * a `Rule[LogicalPlan]`. Registered per session through
  * `spark.experimental.extraOptimizations` (idempotent; the rewritten
  * relation is marked via an option so a fixed-point batch can't loop).
  * Original output attribute ids are preserved (the Project re-exposes
  * them), so references above the relation stay valid. */
object DeletionVectorsRule extends Rule[LogicalPlan] {

  private val appliedMarker = "graft.dvApplied"

  /** Install into `spark.experimental.extraOptimizations` once. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private val dvSchema = StructType(Seq(
    StructField("file_path", StringType), StructField("row_index", LongType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case l @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
        if fs.location.isInstanceOf[SnapshotFileIndex] &&
          !fs.options.contains(appliedMarker) &&
          fs.location.asInstanceOf[SnapshotFileIndex].dvDirs.nonEmpty =>
      val idx = fs.location.asInstanceOf[SnapshotFileIndex]
      val spark = fs.sparkSession
      val metaAttr = l.metadataOutput.headOption.getOrElse(
        return plan) // no metadata column exposed: leave the plan alone
      // the scan, marked + widened with its _metadata column (same
      // data/partition attribute ids — upstream references stay bound)
      val marked = fs.copy(options = fs.options + (appliedMarker -> "true"))(spark)
      val scan = l.copy(relation = marked, output = l.output :+ metaAttr)
      // the DV sidecar as its own explicit-file-list relation
      val qroot = idx.tableRoot
      val hfs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dvFiles = idx.dvDirs.flatMap { d =>
        hfs.listStatus(new Path(qroot, s"_dv/$d")).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString)
      }
      val dvRel = LogicalRelation(
        HadoopFsRelation(
          new ExplicitPartitionedFileIndex(spark, qroot, dvFiles, StructType(Nil)),
          partitionSchema = StructType(Nil),
          dataSchema = dvSchema,
          bucketSpec = None,
          fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
          options = Map.empty)(spark),
        isStreaming = false)
      val metaType = metaAttr.dataType.asInstanceOf[StructType]
      def metaField(name: String) =
        GetStructField(metaAttr, metaType.fieldIndex(name), Some(name))
      val Seq(dvPath, dvIdx) = dvRel.output
      val cond = And(
        EqualTo(metaField("file_path"), dvPath),
        EqualTo(metaField("row_index"), dvIdx))
      Project(l.output,
        Join(scan, dvRel, LeftAnti, Some(cond),
          JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
  }
}
