package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** AS-OF JOIN — a whole-operator extension (SURVEY §7.4 preference tier
  * (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), the operator
  * family Spark's built-ins cannot compose: for every left row, attach the
  * LATEST right row with the same key whose timestamp is <= the left
  * timestamp (backward as-of; null-extended when no such row exists).
  * The canonical use is slowly-changing-dimension lookup over event data:
  * "the fare rate / model version / config in force when this event
  * happened".
  *
  * This implementation is the BROADCAST variant — right side is a dimension
  * (rates, versions, configs): collected once, grouped per key, sorted by
  * timestamp, broadcast, and probed with a per-row binary search. Left side
  * streams through untouched — no shuffle, no sort of the (100 TB) fact
  * side, and the probe stays O(log |dim-key rows|) per event. A sort-merge
  * variant for big-right joins would co-partition both sides on the key —
  * the strategy seam below is where it would plug in.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override lazy val resolved: Boolean =
    childrenResolved && Seq(leftKey, rightKey, leftTs, rightTs).forall(_.resolved)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightOutput: Seq[Attribute]
) extends SparkPlan {

  override def children: Seq[SparkPlan] = Seq(left, right)
  override def output: Seq[Attribute] = left.output ++ rightOutput.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[SparkPlan]): SparkPlan =
    copy(left = newChildren(0), right = newChildren(1))

  protected override def doExecute(): RDD[InternalRow] = {
    // build side: key -> rows sorted by ts (parallel arrays for the search)
    val rKey = BindReferences.bindReference(rightKey, rightOutput)
    val rTs = BindReferences.bindReference(rightTs, rightOutput)
    val grouped = right.executeCollect().toSeq
      .flatMap { row =>
        val k = rKey.eval(row)
        val t = rTs.eval(row)
        if (k == null || t == null) None
        else Some((k, t.asInstanceOf[Number].longValue, row.copy()))
      }
      .groupBy(_._1)
      .map { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        (k, (sorted.map(_._2).toArray, sorted.map(_._3).toArray))
      }
    val bcast = sparkContext.broadcast(grouped)

    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val leftOut = left.output
    val rightOut = rightOutput
    left.execute().mapPartitions { iter =>
      val nullRow = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against NULLABLE right attributes: unmatched left rows are
      // null-extended, regardless of the dimension's declared nullability
      val outAttrs = leftOut ++ rightOut.map(_.withNullability(true))
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val build = bcast.value
      iter.map { lrow =>
        val k = lKey.eval(lrow)
        val t = lTs.eval(lrow)
        val m: InternalRow =
          if (k == null || t == null) nullRow
          else build.get(k) match {
            case None => nullRow
            case Some((tss, rows)) =>
              // rightmost index with ts <= t
              var lo = 0; var hi = tss.length - 1; var ans = -1
              val tv = t.asInstanceOf[Number].longValue
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) <= tv) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
              if (ans < 0) nullRow else rows(ans)
          }
        proj(joined(lrow, m))
      }
    }
  }
}

/** Planner rule: `AsOfJoin` logical node -> broadcast exec. Registered
  * globally by [[graft.functions.GraftExtensions]] and lazily by
  * [[AsOf.join]] via `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, r.output) :: Nil
    case _ => Nil
  }
}

/** User-facing API: backward as-of join on an equi key.
  * `AsOf.join(events, rates, key = "event_type", leftTs = "ts", rightTs = "valid_from")`
  */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
           key: String, leftTs: String, rightTs: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column '$n' (has: ${p.output.map(_.name).mkString(", ")})"))
    GraftSqlShim.ofRows(spark,
      AsOfJoin(l, r, attr(l, key, "left"), attr(r, key, "right"), attr(l, leftTs, "left"), attr(r, rightTs, "right")))
  }
}
