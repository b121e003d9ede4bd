package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.etl.Quality._

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("report evaluates all checks in one aggregate pass") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, -5.0)).toDF("id", "v")
    val r = Quality.report(df, Seq(
      NotNull("id"), Unique("id"), InRange("v", 0, 100), Holds("v_even_id", $"id" > 0)
    )).head
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[Boolean]("not_null:id"))
    assert(r.getAs[Boolean]("unique:id"))
    assert(!r.getAs[Boolean]("in_range:v")) // -5 out of range
    assert(r.getAs[Boolean]("holds:v_even_id"))
  }

  test("enforce names every failing expectation") {
    val df = Seq((1L, 1L), (1L, 2L)).toDF("id", "x")
    val e = intercept[IllegalArgumentException] {
      Quality.enforce(df, Seq(Unique("id"), NotNull("x")))
    }
    assert(e.getMessage.contains("unique:id") && !e.getMessage.contains("not_null:x"))
  }

  test("real-table expectations hold on the synthetic events table") {
    val events = Tables.events(spark, TestSpark.sfDir)
    val checked = Quality.enforce(events, Seq(
      NotNull("event_id"), Unique("event_id"), NotNull("ts"),
      Holds("value_positive", col("value") > 0)
    ))
    assert(checked.count() == events.count())
  }
}
