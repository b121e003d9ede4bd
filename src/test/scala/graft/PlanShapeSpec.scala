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

  test("q21: decorrelated double-EXISTS shuffles lineitem at most twice") {
    val df = SparkEntry.queries("q21_waiting_orders")(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan
    val liShuffles = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.treeString.contains("lineitem") => e
    }
    assert(liShuffles.size <= 2, s"lineitem shuffled ${liShuffles.size}x:\n${p.toString.take(2000)}")
    assert(!p.toString.contains("CartesianProduct"))
    // the supplier⋈nation dim is a broadcast, never a shuffle join
    assert(p.toString.contains("BroadcastHashJoin"), p.toString.take(1000))
  }

  test("q6: every predicate family reaches the lineitem scan as a pushed filter") {
    val df = SparkEntry.queries("q6_revenue_delta")(spark, TestSpark.sfDir)
    // treeString truncates long filter lists — read the scan's metadata
    // (unwrapping AQE, whose exec node hides the plan from collectLeaves)
    val unwrapped = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val pushed = unwrapped.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_discount,0.07)"), pushed)
    assert(pushed.contains("LessThan(l_quantity,24.0)"), pushed)
    // single-table probe: no join operator of any kind in the plan
    assert(!df.queryExecution.executedPlan.toString.contains("Join"))
  }

  /** Queries allowed a BroadcastNestedLoopJoin: each joins a 1-row scalar
    * frame (global total, outlier band, the ANN query vector / probe list)
    * — a broadcast of one row, not an all-pairs product. Anything else
    * acquiring a nested-loop or cartesian join is a scale regression. */
  private val scalarBroadcastAllowed = Set(
    "f3_outlier_band", "e13_pct_of_total", "etl_malformed_gauntlet",
    "ann_brute_topk", "ann_ivf_topk", "ann_ivf_nprobe3", "ann_native_topk",
    "ann_ivf_refresh_topk", // 1-row query-vector frame crossed into the probe scan
    "q22_dormant_customers", // 1-row average-balance threshold
    "q11_value_concentration", // 1-row concentration threshold
    "q20_heavy_suppliers", // 1-row volume threshold
    "agg_hll_merge_rollup", // three 1-row sketch/exact aggregates composed
    "funnel_steps", // three 1-row per-stage counts composed
    "graph_pagerank", // 1-row jump/n scalar crossed into each round
    // r20: cumulativeShare's global form divides by a 1-row total via a
    // scalar broadcast cross join (the pctOfTotal idiom) instead of a
    // single-partition Window.partitionBy() over the whole frame
    "a15_cumulative_demand")

  test("no registry query plans a cartesian product or unexpected nested-loop join") {
    // ml_* fit models and dedup_components iterates at plan-build time;
    // they are covered by their own specs and contain no joins beyond those
    val skip = (n: String) => n.startsWith("ml_") || n == "dedup_components"
    SparkEntry.registry.filterNot(q => skip(q.name)).foreach { q =>
      val p = q.fn(spark, TestSpark.sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct")
      if (!scalarBroadcastAllowed(q.name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans a BroadcastNestedLoopJoin outside the scalar-broadcast allowlist")
    }
  }
}
