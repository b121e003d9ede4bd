package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Parity against the reference's COMMITTED run artifacts: the CSV exports
  * under `/root/reference/data/export/year=2024/month=*` are de-facto golden
  * files (SURVEY.md §5). This spec drives our serve layer over them exactly
  * the way the reference dashboard consumes them
  * (`/root/reference/dashboards/streamlit_app.py:108-160, 215-238`):
  * S12 partitioned-CSV union read, A12 weighted annual rollup, E15 period
  * keys — and checks the numbers against values computed independently from
  * the same files (BASELINE.md table).
  */
class GoldenParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val exportRoot = "/root/reference/data/export"

  private def available = new java.io.File(exportRoot).isDirectory

  /** S12 exactly as the dashboard does it
    * (`streamlit_app.py:108-160`): per-period CSV reads, period columns from
    * the path, union-by-name. */
  private def readKpis = {
    val frames = (1 to 12).map { m =>
      val mm = f"$m%02d"
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$exportRoot/year=2024/month=$mm/kpis")
        .withColumn("year", lit("2024"))
        .withColumn("month", lit(mm))
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  test("S12: per-month CSV union-by-name with path-derived period columns") {
    assume(available)
    val kpis = readKpis
    assert(kpis.columns.toSet.contains("total_viajes"))
    assert(kpis.columns.contains("year") && kpis.columns.contains("month"))
    assert(kpis.count() == 12) // one KPI row per 2024 month
  }

  test("A12: weighted annual KPI rollup reproduces the BASELINE.md totals") {
    assume(available)
    val kpis = readKpis
    val annual = Report.weightedRollup(
      kpis.withColumn("anio", col("year")),
      Seq("anio"),
      Seq("duracion_promedio_min" -> "duracion_anual", "tarifa_promedio" -> "tarifa_anual"),
      "total_viajes"
    ).head
    // BASELINE.md: 39,704,295 curated rows across 2024
    assert(annual.getAs[Long]("total_viajes") == 39704295L)
    // weighted means must sit inside the monthly min/max band (15.76..18.88)
    val dur = annual.getAs[Double]("duracion_anual")
    assert(dur > 15.76 && dur < 18.88)
    val fare = annual.getAs[Double]("tarifa_anual")
    assert(fare > 27.24 && fare < 29.49)
  }

  test("E15 + A14: per-month series gets period keys; peak month is October") {
    assume(available)
    val withP = Report.withPeriod(readKpis)
    assert(withP.select(min("periodo_orden")).head.getInt(0) == 202401)
    // BASELINE.md: month 10 has the 2024 max (3,681,713 rows)
    val peak = Report.argmax(withP, "periodo_orden", "total_viajes").head
    assert(peak.getAs[Int]("peak_periodo_orden") == 202410)
    assert(peak.getAs[Int]("max_total_viajes") == 3681713)
  }

  test("S13: readOptional tolerates a missing input") {
    assert(Tables.readOptional(spark, "/tmp/does-not-exist-xyz").isEmpty)
    assert(Tables.readOptional(spark, s"${TestSpark.sfDir}/lineitem.parquet").isDefined)
  }
}
