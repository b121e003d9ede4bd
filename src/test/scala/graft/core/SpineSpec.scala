package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ShapeQueries

/** The bucketed-spine contract (VERDICT r4 item #5): q4/q18's lineitem-side
  * Exchange disappears when the queries run off the bucketed tables, and the
  * results stay identical to the plain-parquet registry queries (whose
  * oracle hashes the driver already checks).
  */
class SpineSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    // force sort-merge planning so bucket co-location is what removes the
    // shuffle, not a broadcast
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Spine.build(s, TestSpark.sfDir, buckets = 4)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s
  }

  private def shapeQuery(name: String) =
    ShapeQueries.all.find(_.name == name).get.fn(spark, TestSpark.sfDir)

  private def warehouseQuery(name: String) =
    graft.queries.WarehouseQueries.all.find(_.name == name).get
      .fn(spark, TestSpark.sfDir)

  private def exchangesOn(plan: String, key: String): Int =
    s"Exchange hashpartitioning\\($key".r.findAllIn(plan).size

  test("q4 on the spine probes lineitem with zero lineitem-side Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val spine = Spine.q4OrderPriority(spark)
      val plan = spine.queryExecution.executedPlan.toString
      assert(exchangesOn(plan, "l_orderkey") == 0,
        s"bucketed lineitem still shuffles:\n$plan")
      // the plain-parquet registry query DOES shuffle lineitem
      val plainPlan = shapeQuery("q4_order_priority").queryExecution.executedPlan.toString
      assert(exchangesOn(plainPlan, "l_orderkey") >= 1)
      // unchanged results
      assert(spine.collect().toSeq == shapeQuery("q4_order_priority").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("q21 on the spine: both lineitem passes exchange-free, same answer") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val spine = Spine.q21WaitingOrders(spark, TestSpark.sfDir)
      val plan = spine.queryExecution.executedPlan.toString
      assert(exchangesOn(plan, "l_orderkey") == 0,
        s"bucketed lineitem still shuffles:\n$plan")
      assert(spine.collect().toSeq == shapeQuery("q21_waiting_orders").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("scd2 window passes on the bucketed event log are exchange-free") {
    Spine.buildEvents(spark, TestSpark.sfDir, buckets = 4)
    val spine = Spine.scd2UserType(spark)
    val plan = spine.queryExecution.executedPlan.toString
    // the final presentation ORDER BY still exchanges (range partitioning);
    // the WINDOW tier itself must not — no hash exchange on user_id
    assert(exchangesOn(plan, "user_id") == 0,
      s"bucketed events still shuffle for the window:\n$plan")
    val plainPlan = warehouseQuery("scd2_user_type").queryExecution.executedPlan.toString
    assert(exchangesOn(plainPlan, "user_id") >= 1)
    assert(spine.collect().toSeq == warehouseQuery("scd2_user_type").collect().toSeq)
  }

  test("q18 on the spine never shuffles lineitem; results match the plain path") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val spine = Spine.q18LargeOrders(spark, TestSpark.sfDir)
      val plan = spine.queryExecution.executedPlan.toString
      assert(exchangesOn(plan, "l_orderkey") == 0,
        s"bucketed lineitem still shuffles:\n$plan")
      val plainPlan = shapeQuery("q18_large_orders").queryExecution.executedPlan.toString
      assert(exchangesOn(plainPlan, "l_orderkey") >= 2,
        s"plain q18 should shuffle lineitem twice:\n$plainPlan")
      assert(spine.collect().toSeq == shapeQuery("q18_large_orders").collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
