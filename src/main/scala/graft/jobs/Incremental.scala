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
  ): Unit =
    refreshPartitionCols(spark, factPath, martPath, Seq(partitionCol),
      touched.map(Seq(_)), agg)

  /** The general form: multi-level partitioning (e.g. a year/month mart
    * over a year/month fact — the reference's curated layout). Each
    * touched partition is a tuple in `partitionCols` order, as returned by
    * `Merge.mergeIntoPartitionedColsTouched`. */
  def refreshPartitionCols(
      spark: SparkSession,
      factPath: String,
      martPath: String,
      partitionCols: Seq[String],
      touched: Seq[Seq[Any]],
      agg: DataFrame => DataFrame
  ): Unit = {
    if (touched.isEmpty) return
    // literal OR-of-ANDs: partition pruning at planning time
    val prunePred = touched.map { tuple =>
      partitionCols.zip(tuple).map { case (c, v) => col(c) === lit(v) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val slice = spark.read.parquet(factPath).where(prunePred)
    val refreshed = agg(slice)
    partitionCols.foreach(c => require(refreshed.columns.contains(c),
      s"mart aggregation must carry the partition column $c"))
    refreshed.persist()
    try {
      refreshed.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*).parquet(martPath)
      val remaining = refreshed.select(partitionCols.map(col): _*)
        .distinct().collect()
        .map(r => partitionCols.indices.map(r.get).toList: Seq[Any]).toSet
      Merge.deletePartitionDirs(spark, martPath, partitionCols,
        touched.map(_.toList: Seq[Any]).filterNot(remaining.contains))
    } finally { refreshed.unpersist(); () }
  }
}
