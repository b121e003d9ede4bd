package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.serve.Report

/** The full reference pipeline end-to-end on synthetic data (SURVEY.md §3):
  * raw -> ETL (rename/validate/derive/outlier) -> partitioned curated
  * parquet -> 11 marts -> single-file CSV export -> report layer over the
  * exported CSV. Events stand in for trips (ts -> pickup, ts + value
  * seconds -> dropoff, value -> fare). */
class PipelineIntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("raw -> curated -> marts -> export -> report chain") {
    // trips-shaped raw frame with reference source spellings
    val raw = Tables.events(spark, TestSpark.sfDir)
      .select(
        col("ts").as("tpep_pickup_datetime"),
        (col("ts") + expr("make_interval(0, 0, 0, 0, 0, 0, value)")).as("tpep_dropoff_datetime"),
        (col("value") / 10.0).as("trip_distance"),
        col("value").as("fare_amount"),
        col("user_id").as("PULocationID"),
        col("event_type").as("vendor_id")
      )

    val etlOut = Files.createTempDirectory("pipe-etl").toString
    val curated = Jobs.etl(spark, raw, etlOut, 2024, 1, removeOutliers = true)
    val curatedBack = spark.read.parquet(etlOut)
    assert(curatedBack.count() > 0)
    assert(curatedBack.columns.contains("trip_duration_min"))
    assert(new java.io.File(s"$etlOut/year=2024/month=01").isDirectory)

    val martsOut = Files.createTempDirectory("pipe-marts").toString
    val m = Jobs.marts(spark, curatedBack, martsOut)
    assert(m.size == 11)

    // export the KPI mart to single-file CSV and re-read it (serve path)
    val csvOut = Files.createTempDirectory("pipe-csv").toString + "/kpis"
    Jobs.exportCsv(spark.read.parquet(s"$martsOut/kpis"), csvOut)
    val kpis = Jobs.readCsv(spark, csvOut)
    assert(kpis.head.getAs[Any]("total_viajes").toString.toLong == curatedBack.count())

    // report layer over a mart: cumulative demand over hours ends at 100%
    val perHour = spark.read.parquet(s"$martsOut/viajes_por_hora_dia")
      .groupBy("pickup_hour").agg(sum("total_viajes").as("n"))
    val cum = Report.cumulativeShare(perHour, "pickup_hour", "n")
      .orderBy(desc("pickup_hour")).head
    assert(math.abs(cum.getAs[Double]("cum_pct") - 100.0) < 1e-9)
  }
}
