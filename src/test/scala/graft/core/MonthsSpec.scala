package graft.core

import org.scalatest.funsuite.AnyFunSuite

class MonthsSpec extends AnyFunSuite {

  test("U1 normalize zero-pads and validates range") {
    assert(Months.normalize(1) == "01")
    assert(Months.normalize(12) == "12")
    intercept[IllegalArgumentException](Months.normalize(0))
    intercept[IllegalArgumentException](Months.normalize(13))
  }

  test("U1 resolve requires exactly one selector") {
    intercept[IllegalArgumentException](Months.resolve(None, Nil, None))
    intercept[IllegalArgumentException](Months.resolve(Some(1), Seq(2), None))
    assert(Months.resolve(Some(3), Nil, None) == Seq("03"))
    assert(Months.resolve(None, Seq(1, 11), None) == Seq("01", "11"))
  }

  test("U1 quarters map Q1->01,02,03 .. Q4->10,11,12") {
    assert(Months.resolve(None, Nil, Some(1)) == Seq("01", "02", "03"))
    assert(Months.resolve(None, Nil, Some(4)) == Seq("10", "11", "12"))
    intercept[IllegalArgumentException](Months.resolve(None, Nil, Some(5)))
  }

  test("U2 path templates") {
    assert(Months.joinPath("hdfs://nn:8020/data/", "/tlc/raw") == "hdfs://nn:8020/data/tlc/raw")
    assert(Months.partitionPath("/data/curated", 2024, "01") == "/data/curated/year=2024/month=01")
  }
}
