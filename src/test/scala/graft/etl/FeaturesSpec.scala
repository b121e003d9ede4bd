package graft.etl

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E1 duration in minutes divides by 60.0 (double)") {
    val df = Seq((Timestamp.valueOf("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 10:30:30")))
      .toDF("pickup", "dropoff")
    val out = Features.withDurationMin(df, "pickup", "dropoff")
    assert(out.schema("trip_duration_min").dataType.typeName == "double")
    assert(out.select("trip_duration_min").head.getDouble(0) == 30.5)
  }

  test("E3/E4 dayofweek 1=Sunday; weekend = {1,7} (2024-01-07 is a Sunday)") {
    val df = Seq(
      Timestamp.valueOf("2024-01-07 12:00:00"), // Sunday -> dow 1, weekend
      Timestamp.valueOf("2024-01-06 12:00:00"), // Saturday -> dow 7, weekend
      Timestamp.valueOf("2024-01-08 12:00:00")  // Monday -> dow 2, not
    ).toDF("ts")
    val out = Features.withTemporal(df, "ts", "pickup")
      .select("pickup_dow", "is_weekend").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq == Seq((1, 1), (7, 1), (2, 0)))
  }

  test("P6 partition columns are strings with zero-padded month") {
    val df = Seq(1).toDF("x")
    val out = Features.withPartitions(df, 2024, 3)
    assert(out.select("year", "month").head.toSeq == Seq("2024", "03"))
    assert(out.schema("month").dataType.typeName == "string")
  }
}
