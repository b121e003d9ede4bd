package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P1 synonym rename is case-insensitive, first match wins") {
    val df = Seq((1, "x")).toDF("TPEP_Pickup_Datetime", "PULocationID")
    val out = Clean.standardizeColumns(df)
    assert(out.columns.toSeq == Seq("pickup_datetime", "pu_location"))
  }

  test("P1 non-mapped columns pass through unchanged") {
    val df = Seq((1, 2)).toDF("trip_distance", "mystery_col")
    val out = Clean.standardizeColumns(df)
    assert(out.columns.toSeq == Seq("trip_distance", "mystery_col"))
  }

  test("P2 requireColumns throws naming the missing columns") {
    val df = Seq(1).toDF("a")
    val e = intercept[IllegalArgumentException] {
      Clean.requireColumns(df, Seq("a", "b", "c"))
    }
    assert(e.getMessage.contains("b") && e.getMessage.contains("c"))
  }

  test("P3 defaults apply ONLY when column absent (type quirk preserved)") {
    val df = Seq((7L, 1.5)).toDF("payment_type", "trip_distance")
    val out = Clean.ensureColumns(df, Clean.TlcDefaults)
    // present column keeps its numeric type and value
    assert(out.schema("payment_type").dataType.typeName == "long")
    assert(out.select("payment_type").head.getLong(0) == 7L)
    // absent column gets the literal default, including string-for-code quirk
    assert(out.schema("vendor_id").dataType.typeName == "string")
    assert(out.select("vendor_id").head.getString(0) == "desconocido")
    assert(out.select("total_amount").head.getDouble(0) == 0.0)
  }

  test("P4 selectPresent keeps order and tolerates absent columns") {
    val df = Seq((1, 2, 3)).toDF("c", "a", "zz")
    val out = Clean.selectPresent(df, Seq("a", "b", "c"))
    assert(out.columns.toSeq == Seq("a", "c"))
  }

  test("F1 validity filter: positive and non-null conjunction") {
    val df = Seq(
      (1.0, Some(1.0)), (2.0, Some(2.0)), (0.0, Some(1.0)), (3.0, None)
    ).toDF("trip_distance", "fare_amount")
    val out = Clean.filterValid(df, Seq("trip_distance"), Seq("fare_amount"))
    assert(out.count() == 2) // zero distance and null fare both dropped
  }
}
