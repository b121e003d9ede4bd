package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the one `private[sql]` constructor an extension
  * genuinely needs: materializing a DataFrame from a custom LogicalPlan
  * (`classic.Dataset.ofRows`). The standard pattern for Spark extension
  * libraries; everything else in graft uses only public API. */
object GraftSqlShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
