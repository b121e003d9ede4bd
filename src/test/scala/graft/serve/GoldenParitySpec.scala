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

  test("§5 golden parity SWEEPS all 12 committed months, then the annual rollup") {
    // Every committed month is mutually consistent the way month=01 is;
    // sweeping all twelve exercises the weighted-rollup math over the
    // reference's full year, and the ANNUAL rollup (the dashboard's
    // streamlit_app.py:219-229 path) is checked against an independent
    // recomputation from the 12×24 per-hour rows — no pandas, no
    // committed aggregate trusted twice.
    assume(available)
    def mart(mm: String, name: String) =
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$exportRoot/year=2024/month=$mm/$name")
    def relDiff(a: Double, b: Double): Double =
      math.abs(a - b) / math.max(1.0, math.abs(b))
    (1 to 12).foreach { m =>
      val mm = f"$m%02d"
      val kpis = mart(mm, "kpis").head()
      val totalViajes = kpis.getAs[Number]("total_viajes").longValue()
      val varHora = mart(mm, "variabilidad_hora")
      // our weighted rollup over the 24 per-hour rows reproduces the
      // committed monthly KPI row (counts exact, means 1e-9 relative)
      val rolled = Report.weightedRollup(
        varHora.withColumn("all", lit(1)), Seq("all"),
        Seq("duracion_promedio_min" -> "d", "tarifa_promedio" -> "t"),
        "total_viajes").head()
      assert(rolled.getAs[Number]("total_viajes").longValue() == totalViajes,
        s"month $mm: recomputed total_viajes")
      assert(relDiff(rolled.getAs[Double]("d"),
        kpis.getAs[Double]("duracion_promedio_min")) < 1e-9, s"month $mm: duration")
      assert(relDiff(rolled.getAs[Double]("t"),
        kpis.getAs[Double]("tarifa_promedio")) < 1e-9, s"month $mm: fare")
      // hour×dow counts sum to the KPI total exactly
      assert(mart(mm, "viajes_por_hora_dia")
        .agg(sum("total_viajes")).head().getLong(0) == totalViajes, s"month $mm: hour×dow sum")
      // the two single-metric hour series are projections of variabilidad_hora
      val j = varHora.select(col("pickup_hour"),
          col("tarifa_promedio").as("t_full"),
          col("duracion_promedio_min").as("d_full"))
        .join(mart(mm, "tarifa_promedio_hora"), "pickup_hour")
        .join(mart(mm, "duracion_promedio_hora"), "pickup_hour")
        .select(col("t_full"), col("tarifa_promedio"),
          col("d_full"), col("duracion_promedio_min"))
        .collect()
      assert(j.length == 24, s"month $mm: hour series length")
      j.foreach { r =>
        assert(relDiff(r.getDouble(0), r.getDouble(1)) < 1e-9, s"month $mm: $r")
        assert(relDiff(r.getDouble(2), r.getDouble(3)) < 1e-9, s"month $mm: $r")
      }
    }
    // ANNUAL: the rollup of the 12 committed KPI rows must equal a
    // recomputation from the year's 288 per-hour rows
    val annual = Report.weightedRollup(
      readKpis.withColumn("anio", col("year")), Seq("anio"),
      Seq("duracion_promedio_min" -> "dur_anual", "tarifa_promedio" -> "tarifa_anual"),
      "total_viajes").head()
    val allVar = (1 to 12).map(m => mart(f"$m%02d", "variabilidad_hora"))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val r = allVar.agg(
      sum("total_viajes").as("n"),
      sum(col("duracion_promedio_min") * col("total_viajes")).as("wd"),
      sum(col("tarifa_promedio") * col("total_viajes")).as("wt")).head()
    val n = r.getAs[Number]("n").longValue()
    assert(annual.getAs[Number]("total_viajes").longValue() == n,
      "annual total_viajes: committed-kpis rollup vs per-hour recomputation")
    assert(relDiff(annual.getAs[Double]("dur_anual"),
      r.getAs[Double]("wd") / n) < 1e-9, "annual weighted duration")
    assert(relDiff(annual.getAs[Double]("tarifa_anual"),
      r.getAs[Double]("wt") / n) < 1e-9, "annual weighted fare")
  }

  test("§5 golden CSV value parity: serve-layer recomputation diffs against month=01") {
    // The committed month=01 exports are mutually consistent (the
    // reference computed them from ONE curated frame): per-hour counts,
    // weighted means, and cross-mart hour series must agree. Driving
    // OUR serve layer (weightedRollup, the single-file CSV codec) over
    // one mart and value-diffing the result against the reference's
    // OTHER marts is a golden-file check of the serve math + CSV codec
    // that needs no raw TLC input. Tolerance: 1e-9 relative (CSV
    // round-trip of doubles), counts exact.
    assume(available)
    val m01 = s"$exportRoot/year=2024/month=01"
    def mart(name: String) =
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$m01/$name")
    def relDiff(a: Double, b: Double): Double =
      math.abs(a - b) / math.max(1.0, math.abs(b))
    val kpis = mart("kpis").head()
    val totalViajes = kpis.getAs[Number]("total_viajes").longValue()

    // mart 1 — kpis RE-DERIVED through our weightedRollup over
    // variabilidad_hora, EXPORTED through our single-file CSV sink,
    // read back, and value-diffed against the committed kpis
    val varHora = mart("variabilidad_hora")
    val rolled = Report.weightedRollup(
      varHora.withColumn("all", lit(1)), Seq("all"),
      Seq("duracion_promedio_min" -> "duracion_promedio_min",
        "tarifa_promedio" -> "tarifa_promedio"),
      "total_viajes")
    val out = java.nio.file.Files.createTempDirectory("goldkpi").toFile
      .getAbsolutePath + "/kpis"
    graft.jobs.Jobs.exportCsv(rolled.drop("all"), out)
    val ours = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(out).head()
    assert(ours.getAs[Number]("total_viajes").longValue() == totalViajes,
      "recomputed total_viajes must match the committed KPI exactly")
    assert(relDiff(ours.getAs[Double]("duracion_promedio_min"),
      kpis.getAs[Double]("duracion_promedio_min")) < 1e-9)
    assert(relDiff(ours.getAs[Double]("tarifa_promedio"),
      kpis.getAs[Double]("tarifa_promedio")) < 1e-9)

    // mart 2 — viajes_por_hora_dia: the hour×dow counts sum to the KPI
    // total exactly, and per-hour margins equal variabilidad_hora's
    val hourDow = mart("viajes_por_hora_dia")
    assert(hourDow.agg(sum("total_viajes")).head().getLong(0) == totalViajes)
    val margins = hourDow.groupBy("pickup_hour")
      .agg(sum("total_viajes").as("n"))
      .join(varHora.select(col("pickup_hour"),
        col("total_viajes").as("vn")), "pickup_hour")
    assert(margins.count() == 24)
    assert(margins.where(col("n") =!= col("vn")).count() == 0,
      "hour margins must agree across the two committed marts")

    // mart 3 — tarifa_promedio_hora and duracion_promedio_hora are the
    // per-hour projections of variabilidad_hora (24-row value diff)
    val tarifaHora = mart("tarifa_promedio_hora")
    val durHora = mart("duracion_promedio_hora")
    val j = varHora.select(col("pickup_hour"),
        col("tarifa_promedio").as("t_full"),
        col("duracion_promedio_min").as("d_full"))
      .join(tarifaHora, "pickup_hour").join(durHora, "pickup_hour")
      .select(col("t_full"), col("tarifa_promedio"),
        col("d_full"), col("duracion_promedio_min"))
      .collect()
    assert(j.length == 24)
    j.foreach { r =>
      assert(relDiff(r.getDouble(0), r.getDouble(1)) < 1e-9, r.toString)
      assert(relDiff(r.getDouble(2), r.getDouble(3)) < 1e-9, r.toString)
    }

    // mart 4 — errores_por_hora: the scored set is the full month, so
    // its per-hour counts equal variabilidad_hora's and real_promedio
    // is the committed per-hour duration series
    val err = mart("errores_por_hora")
    val ej = err.select(col("pickup_hour"), col("total_viajes").as("en"),
        col("real_promedio"))
      .join(varHora.select(col("pickup_hour"), col("total_viajes"),
        col("duracion_promedio_min")), "pickup_hour")
      .collect()
    assert(ej.length == 24)
    ej.foreach { r =>
      assert(r.getAs[Number]("en").longValue() ==
        r.getAs[Number]("total_viajes").longValue(), r.toString)
      assert(relDiff(r.getAs[Double]("real_promedio"),
        r.getAs[Double]("duracion_promedio_min")) < 1e-6, r.toString)
    }
  }
}
