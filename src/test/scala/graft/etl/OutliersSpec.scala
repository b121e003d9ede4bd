package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F3 band filter trims both tails") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val out = Outliers.sequential(df, Seq("v"), 0.05, 0.95, relErr = 0.001)
    val n = out.count()
    assert(n < 1000 && n > 850)
    val mm = out.agg(org.apache.spark.sql.functions.min("v"),
      org.apache.spark.sql.functions.max("v")).head
    assert(mm.getDouble(0) > 1.0 && mm.getDouble(1) < 1000.0)
  }

  test("F3 sequential semantics: column k+1's band computed AFTER k's filter") {
    // a: uniform 1..100; b equals a, so filtering a's tails first narrows b's
    // quantile inputs. Sequential keeps all surviving rows (bands re-derived
    // on filtered data), while bands from the unfiltered frame would differ.
    // b == a, so column b's band is re-derived on data already trimmed by a:
    // the sequential mode keeps trimming (stricter), single-pass computes both
    // bands on the raw frame. The difference IS the reference semantics
    // (SURVEY.md 7.3) — a "smart" single-pass rewrite changes results.
    val df = (1 to 100).map(i => (i.toDouble, i.toDouble)).toDF("a", "b")
    val seq = Outliers.sequential(df, Seq("a", "b"), 0.10, 0.90, relErr = 0.001).count()
    val single = Outliers.singlePass(df, Seq("a", "b"), 0.10, 0.90, relErr = 0.001).count()
    assert(seq < single)
    assert(single == 81) // one pass: both bands [10.x, 90.x] on raw 1..100
  }

  test("F3 exactBandFilter stays inside one plan (no driver action) and matches percentile bounds") {
    val df = (1 to 200).map(_.toDouble).toDF("v")
    val out = Outliers.exactBandFilter(df, "v", 0.25, 0.75)
    assert(out.count() == 100) // percentile(0.25)=50.75, (0.75)=150.25 -> keeps 51..150
  }
}
