package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a partition-aligned aggregate table (mart)
  * after a partial fact-table change — the companion to `jobs.Merge`.
  *
  * At 100 TB recomputing a mart from scratch because a daily MERGE touched
  * 3 of 5,000 date partitions re-scans the whole fact table for nothing.
  * When the mart's grouping keys INCLUDE the fact's partition column, every
  * mart row is a pure function of exactly one fact partition — so a fact
  * change confined to partitions P can only change mart rows with
  * partition value in P. Refreshing is then: re-aggregate ONLY the touched
  * fact partitions (a partition-pruned scan) and dynamic-overwrite ONLY
  * those mart partitions. Work scales with the size of the change, not the
  * size of the table.
  *
  * The same two write-path edge cases as Merge apply and are handled: the
  * refresh write must not read the path it overwrites (the mart is
  * recomputed from the FACT, so this never arises), and a touched
  * partition whose fact rows all vanished yields no aggregate rows — its
  * stale mart directory is deleted explicitly, since dynamic overwrite
  * only rewrites partitions present in the output.
  */
object Incremental {

  /** Re-aggregate `touched` fact partitions into the mart at `martPath`.
    * `agg` must group by (at least) `partitionCol` — asserted, because a
    * mart row spanning partitions would make per-partition refresh
    * unsound. */
  def refreshPartitions(
      spark: SparkSession,
      factPath: String,
      martPath: String,
      partitionCol: String,
      touched: Seq[Any],
      agg: DataFrame => DataFrame
  ): Unit = {
    if (touched.isEmpty) return
    val slice = spark.read.parquet(factPath)
      .where(col(partitionCol).isin(touched: _*))
    val refreshed = agg(slice)
    require(refreshed.columns.contains(partitionCol),
      s"mart aggregation must carry the partition column $partitionCol")
    refreshed.persist()
    try {
      refreshed.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(martPath)
      val remaining = refreshed.select(col(partitionCol))
        .distinct().collect().map(_.get(0)).toSet
      Merge.deletePartitions(spark, martPath, partitionCol,
        touched.filterNot(remaining.contains))
    } finally { refreshed.unpersist(); () }
  }
}
