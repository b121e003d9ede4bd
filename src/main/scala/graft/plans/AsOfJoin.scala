package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** AS-OF JOIN — a whole-operator extension (SURVEY §7.4 preference tier
  * (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), the operator
  * family Spark's built-ins cannot compose: for every left row, attach the
  * LATEST right row with the same key whose timestamp is <= the left
  * timestamp (backward as-of; null-extended when no such row exists).
  * The canonical use is slowly-changing-dimension lookup over event data:
  * "the fare rate / model version / config in force when this event
  * happened".
  *
  * Two physical variants, chosen like Spark's own JoinSelection:
  *
  *  - BROADCAST (right side is a dimension — rates, versions, configs):
  *    collected once, grouped per key, sorted by timestamp, broadcast, and
  *    probed with a per-row binary search. Left side streams through
  *    untouched — no shuffle, no sort of the (100 TB) fact side, and the
  *    probe stays O(log |dim-key rows|) per event.
  *  - SORT-MERGE (right side is big — per-user state history, SCD tables):
  *    both sides hash-co-partitioned on the key and sorted by (key, ts);
  *    a per-partition streaming merge holds exactly ONE buffered right row
  *    (the latest with ts <= the current left ts), so memory is O(1) per
  *    task no matter how deep a key's history is.
  *
  * `strategyHint` is "auto" (pick by right-side size vs
  * `spark.sql.autoBroadcastJoinThreshold`), "broadcast", or "merge".
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    strategyHint: String = "auto"
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

/** Sort-merge as-of join for big right sides. Declares
  * `ClusteredDistribution(key)` + `SortOrder(key, ts)` on BOTH children, so
  * EnsureRequirements plans the co-partitioning exchange and sorts exactly
  * as it does for Spark's own SortMergeJoinExec — AQE, reused exchanges and
  * existing bucketing/sort orders all apply for free.
  *
  * The merge itself is the backward-as-of recurrence: with both sides
  * ordered by (key, ts), the latest right row with ts <= the current left
  * ts is maintained in a single buffered slot (`held`), advanced
  * monotonically — each right row is visited once per partition, each left
  * row does O(1) amortized work, and per-task memory is one row regardless
  * of key-history depth. */
case class SortMergeAsOfJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rKey = BindReferences.bindReference(rightKey, rightOutput)
    val rTs = BindReferences.bindReference(rightTs, rightOutput)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val leftOut = left.output
    val rightOut = rightOutput

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRow = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val outAttrs = leftOut ++ rightOut.map(_.withNullability(true))
      val proj = UnsafeProjection.create(outAttrs, outAttrs)

      // one-row lookahead over the right side, skipping null key/ts rows
      var nextKey: Any = null
      var nextTs: Long = 0L
      var nextRow: InternalRow = null
      def advanceRight(): Unit = {
        nextRow = null
        while (nextRow == null && rIter.hasNext) {
          val row = rIter.next()
          val k = rKey.eval(row)
          val t = rTs.eval(row)
          if (k != null && t != null) {
            nextKey = k; nextTs = t.asInstanceOf[Number].longValue; nextRow = row
          }
        }
      }
      advanceRight()

      // the single held slot: latest right row whose (key, ts) has been
      // passed by the left cursor
      var heldKey: Any = null
      var heldTs: Long = 0L
      var held: InternalRow = null

      lIter.map { lrow =>
        val k = lKey.eval(lrow)
        val m: InternalRow =
          if (k == null) nullRow
          else {
            val tRaw = lTs.eval(lrow)
            if (tRaw == null) nullRow
            else {
              val t = tRaw.asInstanceOf[Number].longValue
              if (held != null && keyOrd.compare(heldKey, k) != 0) held = null
              var cont = nextRow != null
              while (cont) {
                val c = keyOrd.compare(nextKey, k)
                if (c < 0) advanceRight()
                else if (c == 0 && nextTs <= t) {
                  heldKey = nextKey; heldTs = nextTs
                  held = nextRow.copy()
                  advanceRight()
                } else cont = false
                if (nextRow == null) cont = false
              }
              // left is (key, ts)-sorted, so a held row for this key always
              // has ts <= t; the guard is defensive for equal-ts reordering
              if (held != null && heldTs <= t) held else nullRow
            }
          }
        proj(joined(lrow, m))
      }
    }
  }
}

/** Planner rule: `AsOfJoin` logical node -> physical variant. Size-based
  * selection like Spark's JoinSelection: broadcast while the right side's
  * stats stay under `spark.sql.autoBroadcastJoinThreshold`, sort-merge
  * beyond it (or when hinted). Registered globally by
  * [[graft.functions.GraftExtensions]] and lazily by [[AsOf.join]] via
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, hint) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val merge = hint match {
        case "merge"     => true
        case "broadcast" => false
        case _           => threshold >= 0 && r.stats.sizeInBytes > threshold
      }
      if (merge) SortMergeAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, r.output) :: Nil
      else BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, r.output) :: Nil
    case _ => Nil
  }
}

/** User-facing API: backward as-of join on an equi key.
  * `AsOf.join(events, rates, key = "event_type", leftTs = "ts", rightTs = "valid_from")`
  */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
           key: String, leftTs: String, rightTs: String,
           strategy: String = "auto"): DataFrame = {
    require(Set("auto", "broadcast", "merge")(strategy),
      s"strategy must be auto|broadcast|merge, got '$strategy'")
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column '$n' (has: ${p.output.map(_.name).mkString(", ")})"))
    GraftSqlShim.ofRows(spark,
      AsOfJoin(l, r, attr(l, key, "left"), attr(r, key, "right"),
        attr(l, leftTs, "left"), attr(r, rightTs, "right"), strategy))
  }
}
