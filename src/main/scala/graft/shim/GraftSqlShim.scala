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

  /** A computed batch frame re-expressed as a STREAMING micro-batch frame
    * (isStreaming=true plan over the batch plan's lazily-executed RDD) —
    * what a DSv1 `Source.getBatch` must hand the engine when the batch is
    * not a plain file scan (e.g. a change-feed replay). Evaluation stays
    * lazy: `toRdd` plans but does not run until the sink consumes it. */
  def asStreaming(spark: org.apache.spark.sql.SparkSession,
                  df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = spark.asInstanceOf[SparkSession]
    s.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}

/** Public re-export of the `private[sql]` V1-streaming-fallback marker:
  * a catalog `Table` implementing this serves `spark.readStream.table`
  * through its V1 `StreamSourceProvider` (the CatalogTable names the
  * provider + path). Same extension-shim pattern as `GraftSqlShim`. */
trait GraftV1StreamFallback
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback
