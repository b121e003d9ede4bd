package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-aware write helpers — the small-files / giant-files dials for the
  * 100 TB write path.
  *
  * At cluster scale both failure modes are expensive: thousands of tiny
  * files per partition (one per reduce task) blow up the namenode and
  * planning time of every downstream reader, while single-task
  * multi-gigabyte files serialize the read side. The fix is the same dial
  * from both directions: repartition to the intended file count and cap
  * `maxRecordsPerFile` so a skewed partition splits rather than
  * concentrating.
  */
object Sinks {

  /** Write parquet with an explicit target of `filesPerPartition` files
    * per partition-column combination (or total, when unpartitioned).
    *
    * `repartition(n, cols)` hash-distributes rows of each partition value
    * over at most n tasks -> at most n files per partition dir; the
    * `maxRecordsPerFile` cap is the safety net when a partition value is
    * hot: that task's file SPLITS at the cap instead of producing one
    * giant file. */
  def writeSizedParquet(
      df: DataFrame,
      out: String,
      partitionCols: Seq[String],
      filesPerPartition: Int,
      maxRecordsPerFile: Long
  ): Unit = {
    require(filesPerPartition > 0 && maxRecordsPerFile > 0)
    val repartitioned =
      if (partitionCols.isEmpty) df.repartition(filesPerPartition)
      else df.repartition(filesPerPartition, partitionCols.map(col): _*)
    val writer = repartitioned.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(out)
  }

  /** Compact an existing parquet dataset to `targetFiles` files (the
    * maintenance job for an append-heavy table: read, re-cluster, rewrite).
    * Sort-within-partitions by `clusterBy` when given, so min/max row-group
    * stats stay selective for data-skipping readers. */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      out: String,
      targetFiles: Int,
      clusterBy: Seq[String] = Nil
  ): Unit = {
    val df = spark.read.parquet(path).repartition(targetFiles)
    val clustered =
      if (clusterBy.isEmpty) df else df.sortWithinPartitions(clusterBy.map(col): _*)
    clustered.write.mode(SaveMode.Overwrite).parquet(out)
  }
}
