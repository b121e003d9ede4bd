package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Coalesce, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DataType

import graft.jobs.Snapshots

/** Front-door half of the NOT-NULL-DEFAULT contract
  * (`graft.default.<col>`, see `Snapshots.addColumnDefault`): the
  * native scan null-fills the column for files that PREDATE the
  * declaration, so the plan must coalesce those rows to the declared
  * constant. This rule wraps a defaults-bearing snapshot relation in a
  * `Project` that aliases each defaulted column to
  * `coalesce(col, <constant>)` UNDER ITS ORIGINAL exprId — upstream
  * references stay bound, and everything else passes through, so
  * filters on plain columns keep their parquet pushdown (the coalesce
  * itself is not a pushable predicate, which is exactly right: a
  * pushed NULL-comparison would mis-evaluate pre-declaration rows).
  *
  * The constant is evaluated ONCE per immutable (root, version) — a
  * 1-row local query at declaration grain, memoized — and embedded as
  * a resolved `Literal`, so the injected expressions need no analysis.
  * Composes with `DeletionVectorsRule` in either registration order:
  * both preserve attribute ids, and the coalesce is row-local so its
  * position above or below the DV anti-join cannot change results. */
object ColumnDefaultsRule extends Rule[LogicalPlan] {

  private val appliedMarker = "graft.defaultsApplied"

  /** Install into `spark.experimental.extraOptimizations` once. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  // evaluated constants per immutable (root, version): col -> literal
  private val litCache =
    new ConcurrentHashMap[(String, Long), Map[String, Literal]]()

  private def literalsFor(
      spark: SparkSession, idx: SnapshotFileIndex): Map[String, Literal] =
    litCache.computeIfAbsent((idx.tableRoot.toString, idx.version), _ => {
      Snapshots.defaultsOf(
        Snapshots.tableProperties(spark, idx.root, idx.version))
        .map { case (c, tpe, sql) =>
          val v = spark.range(1)
            .select(org.apache.spark.sql.functions.expr(sql).cast(tpe).as("d"))
            .head().get(0)
          c -> Literal.create(v, tpe)
        }.toMap
    })

  private def defaultsBearing(l: LogicalRelation): Boolean = l.relation match {
    case fs: HadoopFsRelation =>
      fs.location.isInstanceOf[SnapshotFileIndex] &&
        !fs.options.contains(appliedMarker) &&
        Snapshots.tableProperties(fs.sparkSession,
            fs.location.asInstanceOf[SnapshotFileIndex].root,
            fs.location.asInstanceOf[SnapshotFileIndex].version)
          .keys.exists(_.startsWith("graft.default."))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    var changed = false
    val rewritten = plan transform {
      case l: LogicalRelation if defaultsBearing(l) =>
        changed = true
        val fs = l.relation.asInstanceOf[HadoopFsRelation]
        val idx = fs.location.asInstanceOf[SnapshotFileIndex]
        val lits = literalsFor(fs.sparkSession, idx)
        val marked = l.copy(relation =
          fs.copy(options = fs.options + (appliedMarker -> "true"))(fs.sparkSession))
        val projections: Seq[NamedExpression] = l.output.map { a =>
          lits.get(a.name) match {
            case Some(lit) =>
              val dflt: org.apache.spark.sql.catalyst.expressions.Expression =
                if (lit.dataType == a.dataType) lit
                // the column may have been WIDENED after the declaration
                else Cast(lit, a.dataType,
                  Some(fs.sparkSession.sessionState.conf.sessionLocalTimeZone))
              Alias(Coalesce(Seq(a, dflt)), a.name)(exprId = a.exprId)
            case None => a
          }
        }
        Project(projections, marked)
    }
    // the Project over full output would pin the scan wide — re-prune
    // locally (same discipline as DeletionVectorsRule)
    if (!changed) plan
    else {
      var cur = rewritten
      var it = 0
      while (it < 10) {
        val next = org.apache.spark.sql.catalyst.optimizer.ColumnPruning(
          org.apache.spark.sql.catalyst.optimizer.CollapseProject(cur))
        if (next.fastEquals(cur)) it = 10 else { cur = next; it += 1 }
      }
      cur
    }
  }
}
