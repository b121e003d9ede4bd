package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions (the 100 TB checklist as tests, not just
  * docs): pushdown reaches the scan, read schemas are pruned, small dims
  * broadcast, top-k avoids global sorts. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("s1: predicates pushed to the parquet scan; schema pruned to 4 columns") {
    val p = plan("s1_scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate"))
  }

  test("j2: all four dimension joins are broadcast (no shuffle joins)") {
    val p = plan("j2_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("a5: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("a5_top_users")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q1: aggregation is partial+final hash aggregate with one exchange") {
    val p = plan("q1_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("etl chain: validity filters are pushed into the events scan") {
    val p = plan("etl_clean_events")
    assert(p.contains("PushedFilters") && p.contains("IsNotNull"))
  }
}
