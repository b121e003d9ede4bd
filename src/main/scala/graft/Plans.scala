package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints `explain("formatted")` for selected queries so the
  * physical shape (PushedFilters, ReadSchema pruning, broadcast joins,
  * WholeStageCodegen spans, TakeOrderedAndProject) can be reviewed against
  * the scale checklist in the module scaladocs. */
object Plans {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
                else Seq("s1_scan_pruned", "j2_revenue_by_nation", "q1_pricing", "a5_top_users",
                  "j_range_tiers", "w_sessionize", "q3_shipping_priority", "j_asof_rates_merge")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
    // Dump co-located join plans under the same no-broadcast window their
    // oracles assert in (bucket_join_agg pins ZERO exchanges with
    // broadcast off; a dump taken with broadcast on documents a plan the
    // oracle never runs).
    val spark = (if (sys.env.contains("SPARK_GRAFT_PLANS_NO_BROADCAST"))
      b.config("spark.sql.autoBroadcastJoinThreshold", "-1") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
