package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("A12 weighted re-aggregation of group averages equals the global average") {
    // raw data -> per-group (avg, n) -> weighted rollup == direct global avg
    val raw = Seq((1, 10.0), (1, 20.0), (2, 60.0)).toDF("g", "v")
    val marts = raw.groupBy("g").agg(avg($"v").as("avg_v"), count(lit(1)).as("n"))
    val rolled = Report.weightedRollup(marts.withColumn("all", lit(1)),
      Seq("all"), Seq("avg_v" -> "wavg"), "n").head
    assert(rolled.getAs[Double]("wavg") == 30.0)
    assert(rolled.getAs[Long]("n") == 3L)
  }

  test("E13 pctOfTotal sums to 100") {
    val df = Seq(("a", 10L), ("b", 30L), ("c", 60L)).toDF("k", "n")
    val out = Report.pctOfTotal(df, "n")
    assert(math.abs(out.agg(sum("pct")).head.getDouble(0) - 100.0) < 1e-9)
  }

  test("A15 cumulative share ends at 100% and is monotone") {
    val df = Seq((0, 5L), (1, 10L), (2, 85L)).toDF("hour", "n")
    val out = Report.cumulativeShare(df, "hour", "n").orderBy("hour")
      .select("cum_pct").collect().map(_.getDouble(0))
    assert(out.last == 100.0)
    assert(out.sameElements(out.sorted))
  }

  test("A14 argmax picks peak and trough") {
    val df = Seq((0, 5L), (7, 50L), (23, 1L)).toDF("hour", "n")
    val row = Report.argmax(df, "hour", "n").head
    assert(row.getAs[Int]("peak_hour") == 7)
    assert(row.getAs[Int]("trough_hour") == 23)
  }

  test("J3 decode falls back to 'Otro' and builds display label") {
    val dim = Seq((1, "Tarjeta"), (2, "Efectivo")).toDF("code", "label")
    val df = Seq(1, 2, 9).toDF("payment_type")
    val out = Report.decode(df, "payment_type", dim)
      .orderBy("payment_type").select("etiqueta", "display").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("Tarjeta", "Efectivo", "Otro"))
    assert(out(2).getString(1) == "9 - Otro")
  }

  test("E15 period key builds YYYY-MM label and sortable int") {
    val df = Seq(("2024", "03")).toDF("year", "month")
    val row = Report.withPeriod(df).head
    assert(row.getAs[String]("periodo") == "2024-03")
    assert(row.getAs[Int]("periodo_orden") == 202403)
  }
}
