package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory.
  *
  * Mirrors the reference's session contract (`/root/reference/src/spark_session.py:3-18`):
  * UTC session timezone, explicit shuffle-partition count, WARN log level,
  * dynamic partition overwrite for idempotent partition re-runs
  * (`/root/reference/scripts/02_spark_etl.py:65`).
  *
  * Scale notes (100 TB / 1000-executor design):
  *   - AQE on: runtime shuffle-partition coalescing + skew-join splitting means
  *     the static `shufflePartitions` only needs to be an upper bound.
  *   - `local[32]` + 32 shuffle partitions for the test harness; on a real
  *     cluster callers pass `master=None` (spark-submit provides it) and a
  *     shuffle-partition count sized to 2-3x total cores.
  */
object Sessions {
  def local(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors.min(32),
      shufflePartitions: Int = 32
  ): SparkSession =
    build(appName, Some(s"local[$cores]"), shufflePartitions)

  def build(
      appName: String,
      master: Option[String],
      shufflePartitions: Int
  ): SparkSession = {
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE also re-optimizes the materialization of persisted frames
      // (off by default): the engine persists O(change) intermediates
      // (merge candidates, keysets), and without this their cached
      // partitioning stays at the static shuffle-partition count —
      // every downstream write then emits that many near-empty files.
      // Scale-adaptive by construction (AQE's advisory size governs).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.filterPushdown", "true")
      // testdata timestamps are `timestamp[us]` isAdjustedToUTC=false; infer
      // them as the legacy LTZ type (exact under the UTC session timezone)
      // so unix_micros/watermark contracts hold — see Tables.ensureTimestampCompat
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // DSv2 catalog + analyzer hooks for snapshot tables
      // (SELECT/INSERT/time travel on graft.<table>) — sources/GraftCatalog
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
    val withMaster = master.fold(b)(b.master)
    val spark = withMaster.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
