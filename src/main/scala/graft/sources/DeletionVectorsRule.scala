package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GetStructField, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Optimizer rule keeping the NATIVE scan path for snapshot versions
  * that carry merge-on-read deletion vectors: a
  * `LogicalRelation(HadoopFsRelation(SnapshotFileIndex))` over a
  * DV-carrying version is rewritten into
  *
  * {{{ Project(original output)(
  *       Filter(pushed predicates)(scan+_metadata)
  *         ⟕̸(anti, BROADCAST)  dv-sidecar relation
  *         ON _metadata.file_path = dv.file_path
  *        AND _metadata.row_index = dv.row_index) }}}
  *
  * so deleted rows are filtered by the scan's OWN row positions with
  * vectorized reads, whole-stage codegen and row-group pushdown intact
  * — the plan-injection shape Delta's DV reads use, expressed as a
  * `Rule[LogicalPlan]` registered through
  * `spark.experimental.extraOptimizations`.
  *
  * This batch runs AFTER predicate pushdown, so the rule matches the
  * post-pushdown `Filter(cond, relation)` adjacency and RE-PUSHES the
  * deterministic conjuncts beneath the injected anti-join (sound for
  * LeftAnti: filtering the left input first preserves semantics) —
  * without this the join would sever the Filter-to-scan adjacency and
  * every filtered read of a DV-carrying version would lose partition
  * pruning, stats pruning and row-group pushdown. Idempotent under a
  * fixed-point batch (rewritten relations are marked via an option);
  * original output attribute ids are preserved so references above
  * stay valid. A DV-carrying relation that cannot expose `_metadata`
  * (e.g. a user column shadows the name) fails LOUDLY — serving it
  * bare would resurrect deleted rows. */
object DeletionVectorsRule extends Rule[LogicalPlan] with PredicateHelper {

  private val appliedMarker = "graft.dvApplied"

  /** Install into `spark.experimental.extraOptimizations` once. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private val dvSchema = StructType(Seq(
    StructField("file_path", StringType), StructField("row_index", LongType)))

  private def dvCarrying(l: LogicalRelation): Boolean = l.relation match {
    case fs: HadoopFsRelation =>
      fs.location.isInstanceOf[SnapshotFileIndex] &&
        !fs.options.contains(appliedMarker) &&
        fs.location.asInstanceOf[SnapshotFileIndex].dvDirs.nonEmpty
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    // post-pushdown adjacency: keep the filter pushable by re-planting
    // its deterministic conjuncts directly on the scan, under the join
    case Filter(cond, l: LogicalRelation) if dvCarrying(l) =>
      val (det, nondet) = splitConjunctivePredicates(cond).partition(_.deterministic)
      val joined = rewrite(l, det.reduceOption(And))
      nondet.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
    case l: LogicalRelation if dvCarrying(l) =>
      rewrite(l, None)
  }

  private def rewrite(l: LogicalRelation, pushed: Option[Expression]): LogicalPlan = {
    val fs = l.relation.asInstanceOf[HadoopFsRelation]
    val idx = fs.location.asInstanceOf[SnapshotFileIndex]
    val spark = fs.sparkSession
    val metaAttr = l.metadataOutput.headOption.getOrElse(
      throw new IllegalStateException(
        s"version of ${idx.tableRoot} carries deletion vectors but the relation " +
          "exposes no _metadata column (a data column shadows the name?) — " +
          "refusing to serve the scan bare, it would resurrect deleted rows"))
    // the scan, marked + widened with its _metadata column (same
    // data/partition attribute ids — upstream references stay bound)
    val marked = fs.copy(options = fs.options + (appliedMarker -> "true"))(spark)
    val scan = l.copy(relation = marked, output = l.output :+ metaAttr)
    val filtered = pushed.map(Filter(_, scan)).getOrElse(scan)
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
      Join(filtered, dvRel, LeftAnti, Some(cond),
        JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST))))))
  }
}
