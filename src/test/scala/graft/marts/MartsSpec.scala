package graft.marts

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MartsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("E5 distance bin boundaries are strict-< at exactly 1/3/5/10/20") {
    val df = Seq(0.99, 1.0, 2.99, 3.0, 4.99, 5.0, 9.99, 10.0, 19.99, 20.0).toDF("d")
    val out = Marts.withDistanceBins(df, "d")
      .select("d", "distancia_bin").collect().map(r => (r.getDouble(0), r.getString(1))).toMap
    assert(out(0.99) == "0-1"); assert(out(1.0) == "1-3")
    assert(out(2.99) == "1-3"); assert(out(3.0) == "3-5")
    assert(out(4.99) == "3-5"); assert(out(5.0) == "5-10")
    assert(out(9.99) == "5-10"); assert(out(10.0) == "10-20")
    assert(out(19.99) == "10-20"); assert(out(20.0) == "20+")
  }

  test("A5 topZones returns k rows ordered by count desc") {
    val df = (1 to 100).map(i => (i % 7, 1.0, 2.0, 3.0)).toDF("z", "d", "t", "f")
    val out = Marts.topZones(df, "z", "d", "t", "f", k = 3).collect()
    assert(out.length == 3)
    val counts = out.map(_.getAs[Long]("total_viajes"))
    assert(counts.sorted.reverse.toSeq == counts.toSeq)
  }

  test("A8 variability exact percentiles unpack p25/p50/p75") {
    val df = (1 to 100).map(i => (1, i.toDouble, i.toDouble)).toDF("k", "dur", "fare")
    val row = Marts.variability(df, "k", "dur", "fare", exact = true).head
    assert(row.getAs[Double]("duracion_p50") == 50.5)
    assert(row.getAs[Long]("total_viajes") == 100L)
  }

  test("A9 errorsByHour computes MAE and RMSE") {
    val df = Seq((1, 10.0, 12.0), (1, 10.0, 6.0)).toDF("h", "label", "pred")
    val row = Marts.errorsByHour(df, "h", "pred", "label").head
    assert(row.getAs[Double]("mae") == 3.0) // |2| and |-4| -> 3
    assert(math.abs(row.getAs[Double]("rmse") - math.sqrt(10.0)) < 1e-12)
  }
}
