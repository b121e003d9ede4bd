package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Clean, Features, Outliers}
import graft.marts.Marts

/** The reference's job layer (SURVEY.md §3): ETL -> curated partitioned
  * parquet; marts -> per-mart parquet; export -> single-file CSV/JSON.
  * Sinks S3-S7.
  *
  * Scale notes:
  *   - partitioned writes use dynamic partition overwrite (set in
  *     graft.core.Sessions) so month re-runs are idempotent without
  *     clobbering sibling partitions (`/root/reference/scripts/02_spark_etl.py:65`);
  *   - the curated frame is cached once and reused by all marts — the
  *     reference re-scans parquet 11 times (`03_spark_eda_agg.py:220-240`),
  *     which at 100 TB is 11 full-table scans; one cache + 11 aggregates is
  *     the same answers with one scan;
  *   - `coalesce(1)` single-file sinks are presentation-layer only (small
  *     mart outputs), never applied to data-scale frames.
  */
object Jobs {

  /** S3 + the ETL chain of SURVEY.md §3.1: standardize, validate, default,
    * project, filter, derive, outlier-filter, partition, write. */
  def etl(
      spark: SparkSession,
      raw: DataFrame,
      out: String,
      year: Int,
      month: Int,
      requiredCols: Seq[String] = Seq("pickup_datetime", "dropoff_datetime", "trip_distance", "fare_amount"),
      removeOutliers: Boolean = true
  ): DataFrame = {
    val std = Clean.standardizeColumns(raw)
    Clean.requireColumns(std, requiredCols)
    val defaulted = Clean.ensureColumns(std, Clean.TlcDefaults)
    val projected = Clean.selectPresent(defaulted, Seq(
      "pickup_datetime", "dropoff_datetime", "trip_distance", "fare_amount",
      "total_amount", "passenger_count", "payment_type", "pu_location",
      "do_location", "vendor_id", "ratecode_id"))
    val valid = Clean.filterValid(projected,
      positiveCols = Seq("trip_distance", "fare_amount"),
      nonNullCols = Seq("pickup_datetime", "dropoff_datetime"))
    val durated = Features.withDurationMin(valid, "pickup_datetime", "dropoff_datetime")
      .filter(col("trip_duration_min") > 0)
    val featured = Features.withTemporal(durated, "pickup_datetime", "pickup")
    val cleaned =
      if (removeOutliers)
        Outliers.sequentialCached(featured, Seq("trip_distance", "fare_amount", "trip_duration_min"))
      else featured
    val curated = Features.withPartitions(cleaned, year, month)
    curated.write.mode(SaveMode.Overwrite).partitionBy("year", "month").parquet(out)
    curated
  }

  /** S4/S7 + §3.2: the 11 marts off ONE cached curated frame. */
  def marts(spark: SparkSession, curated: DataFrame, outRoot: String): Map[String, DataFrame] = {
    val c = curated.cache()
    val fare = Marts.fareColumn(c)
    val m: Map[String, DataFrame] = Map(
      "kpis" -> Marts.kpis(c, "trip_duration_min", fare),
      "viajes_por_hora_dia" -> Marts.tripsByHourDow(c, "pickup_hour", "pickup_dow"),
      "duracion_promedio_hora" -> Marts.avgByHour(c, "pickup_hour", "trip_duration_min", "duracion_promedio_min"),
      "tarifa_promedio_hora" -> Marts.avgByHour(c, "pickup_hour", fare, "tarifa_promedio"),
      "top_origen" -> Marts.topZones(c, "pu_location", "trip_distance", "trip_duration_min", fare),
      "top_destino" -> Marts.topZones(c, "do_location", "trip_distance", "trip_duration_min", fare),
      "pagos" -> Marts.byCategory(c, "payment_type", "trip_duration_min", fare),
      "vendor" -> Marts.byCategory(c, "vendor_id", "trip_duration_min", fare),
      "distancia_bins" -> Marts.distanceBins(c, "trip_distance", "trip_duration_min", fare),
      "variabilidad_hora" -> Marts.variability(c, "pickup_hour", "trip_duration_min", fare),
      "variabilidad_dia" -> Marts.variability(c, "pickup_dow", "trip_duration_min", fare)
    )
    m.foreach { case (name, df) =>
      val sink = if (name == "kpis") df.coalesce(1) else df
      sink.write.mode(SaveMode.Overwrite).parquet(s"$outRoot/$name")
    }
    c.unpersist(blocking = false)
    m
  }

  /** S5: single-file CSV with header (dashboard export,
    * `/root/reference/scripts/06_export_for_dashboard.py:111-116`). */
  def exportCsv(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(out)

  /** S6: single-file JSON record sink
    * (`/root/reference/scripts/04_train_sparkml.py:149-151`). */
  def exportJson(df: DataFrame, out: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(out)

  /** S2/S12-style readers for the exported artifacts. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
