package graft.core

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Proof that the AQE skew-join handling the session factory turns on
  * (graft.core.Sessions) actually ENGAGES: a sort-merge join with one hot
  * key must re-plan with split skewed partitions (the join node reports
  * `isSkewJoin`) once the skew thresholds are scaled down to fixture size.
  * Salting (graft.core.Skew) remains the tool for aggregation skew and for
  * joins AQE cannot re-plan; this covers the path AQE handles by itself. */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the skew detector down to fixture size
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "24KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1" // force SMJ
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of left rows share key 0; right is a plain dimension
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 100).as("k"),
          concat(lit("payload-"), col("id")).as("pl"))
      val right = spark.range(100).select(col("id").as("k"), col("id").cast("string").as("name"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's queryExecution (count() would plan a
      // separate one, and AQE only finalizes plans during execution)
      assert(joined.collect().length == 200000)
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an AdaptiveSparkPlan")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("isSkewJoin=true") || finalPlan.contains("skew=true"),
        s"AQE did not mark the join as skew-handled:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
