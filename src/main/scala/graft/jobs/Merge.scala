package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch MERGE/upsert into a partitioned parquet table — the batch twin of
  * `graft.streaming.StreamingJobs.foreachBatchKeyMerge` (VERDICT r4 item #4).
  *
  * Semantics (MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
  * INSERT, whole-row update): source rows replace target rows with the same
  * key; unmatched source rows are appended. Only partitions the merge
  * actually touches are rewritten (dynamic partition overwrite); every other
  * partition's files are left byte-identical on disk — at 100 TB a daily
  * upsert touching 3 of 5,000 date partitions must not rewrite (or even
  * read) the other 4,997.
  *
  * Touched = partitions RECEIVING source rows ∪ partitions LOSING a matched
  * row (an update may move a row across partitions, e.g. a status change on
  * a status-partitioned table). Detecting departures needs a key semi-join
  * against the full target — the unavoidable cost of move-aware MERGE
  * without a transaction log. When the caller knows rows never move (the
  * key functionally determines the partition — the common date-partitioned
  * case), `detectMoves = false` skips that full scan and the merge reads
  * ONLY the touched partitions end to end.
  *
  * Scale shape:
  *   - the key anti-join runs kept-side: only TOUCHED partitions of the
  *     target are scanned (partition-pruned), joined against the (small)
  *     source keyset — Catalyst broadcasts it under the threshold, AQE
  *     converts to shuffle join when the batch is genuinely large;
  *   - the merged frame is staged to a scratch dir first (a plan cannot
  *     overwrite a path it is reading), then swapped in with a dynamic
  *     partition overwrite — two sequential writes of the touched
  *     partitions only, never of the table;
  *   - the touched-partition list is collected to the driver by design: it
  *     is bounded by the table's partition count, not its row count.
  */
object Merge {

  /** Merge `source` into the partitioned parquet table at `targetPath` by
    * `keyCols`, rewriting only touched `partitionCol` partitions. Returns
    * the post-merge table (read back from `targetPath`). */
  def mergeIntoPartitioned(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      stagingPath: String,
      detectMoves: Boolean = true
  ): DataFrame =
    mergeIntoPartitionedTouched(spark, targetPath, source, keyCols,
      partitionCol, stagingPath, detectMoves)._1

  /** As `mergeIntoPartitioned`, additionally returning the touched
    * partition values — the input downstream incremental maintenance
    * (`jobs.Incremental`) needs to refresh only what changed. */
  def mergeIntoPartitionedTouched(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      stagingPath: String,
      detectMoves: Boolean = true
  ): (DataFrame, Seq[Any]) = {
    require(keyCols.nonEmpty && !keyCols.contains(partitionCol),
      "keyCols must be non-empty and disjoint from the partition column")
    val target = spark.read.parquet(targetPath)
    // last-writer-wins within the batch would be nondeterministic; collapse
    // duplicate keys up front (callers with an ordering should pre-resolve)
    val src = source.dropDuplicates(keyCols)
    val srcKeys = src.select(keyCols.map(col): _*)

    val receiving = src.select(col(partitionCol)).distinct()
    val touchedDf =
      if (detectMoves) {
        val departing = target.join(srcKeys, keyCols, "left_semi")
          .select(col(partitionCol)).distinct()
        receiving.union(departing).distinct()
      } else receiving
    val touched = touchedDf.collect().map(_.get(0)).toSeq
    if (touched.isEmpty) return (target, Nil)

    val targetTouched = target.where(col(partitionCol).isin(touched: _*))
    val kept = targetTouched.join(srcKeys, keyCols, "left_anti")
    val merged = kept.unionByName(src.select(target.columns.map(col): _*))

    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(stagingPath)
    spark.read.parquet(stagingPath).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // touched partitions only
      .partitionBy(partitionCol)
      .parquet(targetPath)
    // Dynamic overwrite only rewrites partitions PRESENT in the output — a
    // touched partition whose every row departed (moved or was upserted
    // away) is absent from `merged` and would keep its stale files. Those
    // must be deleted explicitly.
    val remaining = spark.read.parquet(stagingPath)
      .select(col(partitionCol)).distinct().collect().map(_.get(0)).toSet
    deletePartitions(spark, targetPath, partitionCol,
      touched.filterNot(remaining.contains))
    (spark.read.parquet(targetPath), touched)
  }

  /** Remove the partition directories for `values` under `path` (escaped
    * the same way Spark's file-source writer lays them out). */
  private[jobs] def deletePartitions(
      spark: SparkSession, path: String, partitionCol: String, values: Seq[Any]): Unit =
    if (values.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      values.foreach { v =>
        val dir = new org.apache.hadoop.fs.Path(path,
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(partitionCol, String.valueOf(v)))
        fs.delete(dir, true); ()
      }
    }
}
