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
  * Partitioning may be MULTI-LEVEL (e.g. the reference's curated table is
  * `year/month` — `scripts/02_spark_etl.py:137`): a "partition" is then a
  * tuple of values, touched-tuple pruning compiles to a literal
  * OR-of-ANDs predicate (planning-time pruning; a semi join on partition
  * columns would only prune at runtime via DPP), and cleanup deletes the
  * nested `k1=v1/k2=v2` directory.
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
    val (df, touched) = mergeIntoPartitionedColsTouched(spark, targetPath,
      source, keyCols, Seq(partitionCol), stagingPath, detectMoves)
    (df, touched.map(_.head))
  }

  /** The general form: multi-level partitioning. Each touched partition is
    * a tuple of values in `partitionCols` order. */
  def mergeIntoPartitionedColsTouched(
      spark: SparkSession,
      targetPath: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCols: Seq[String],
      stagingPath: String,
      detectMoves: Boolean = true
  ): (DataFrame, Seq[Seq[Any]]) = {
    require(keyCols.nonEmpty && partitionCols.nonEmpty &&
      keyCols.intersect(partitionCols).isEmpty,
      "keyCols must be non-empty and disjoint from the partition columns")
    val target = spark.read.parquet(targetPath)
    // last-writer-wins within the batch would be nondeterministic; collapse
    // duplicate keys up front (callers with an ordering should pre-resolve)
    val src = source.dropDuplicates(keyCols)
    val srcKeys = src.select(keyCols.map(col): _*)
    val pCols = partitionCols.map(col)

    val receiving = src.select(pCols: _*).distinct()
    val touchedDf =
      if (detectMoves) {
        val departing = target.join(srcKeys, keyCols, "left_semi")
          .select(pCols: _*).distinct()
        receiving.union(departing).distinct()
      } else receiving
    val touched: Seq[Seq[Any]] =
      touchedDf.collect().map(r => partitionCols.indices.map(r.get).toList).toSeq
    if (touched.isEmpty) return (target, Nil)

    // literal OR-of-ANDs so pruning happens at PLANNING time
    val prunePred = touched.map { tuple =>
      partitionCols.zip(tuple).map { case (c, v) => col(c) === lit(v) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val targetTouched = target.where(prunePred)
    val kept = targetTouched.join(srcKeys, keyCols, "left_anti")
    val merged = kept.unionByName(src.select(target.columns.map(col): _*))

    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(stagingPath)
    spark.read.parquet(stagingPath).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic") // touched partitions only
      .partitionBy(partitionCols: _*)
      .parquet(targetPath)
    // Dynamic overwrite only rewrites partitions PRESENT in the output — a
    // touched partition whose every row departed (moved or was upserted
    // away) is absent from `merged` and would keep its stale files. Those
    // must be deleted explicitly.
    val remaining = spark.read.parquet(stagingPath)
      .select(pCols: _*).distinct().collect()
      .map(r => partitionCols.indices.map(r.get).toList: Seq[Any]).toSet
    deletePartitionDirs(spark, targetPath, partitionCols,
      touched.filterNot(remaining.contains))
    (spark.read.parquet(targetPath), touched)
  }

  /** Remove the (possibly nested) partition directories for the given
    * value tuples under `path`, escaped the same way Spark's file-source
    * writer lays them out. */
  private[jobs] def deletePartitionDirs(
      spark: SparkSession,
      path: String,
      partitionCols: Seq[String],
      tuples: Seq[Seq[Any]]): Unit =
    if (tuples.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      tuples.foreach { tuple =>
        val rel = partitionCols.zip(tuple).map { case (c, v) =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(c, String.valueOf(v))
        }.mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(path, rel), true); ()
      }
    }

  /** Single-column convenience used by `jobs.Incremental`. */
  private[jobs] def deletePartitions(
      spark: SparkSession, path: String, partitionCol: String, values: Seq[Any]): Unit =
    deletePartitionDirs(spark, path, Seq(partitionCol), values.map(Seq(_)))
}
