package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the engine's timestamp-read contract after the 2026-08-13 testdata
  * regen: the parquet files store `timestamp[us]` isAdjustedToUTC=false,
  * which stock Spark 4 infers as TIMESTAMP_NTZ. The engine reads them as
  * the legacy LTZ TimestampType (Tables.ensureTimestampCompat) so
  * `unix_micros`, watermarks, and every downstream LTZ contract hold —
  * exact under the pinned UTC session timezone. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("testdata timestamp columns read as LTZ TimestampType, not NTZ") {
    val e = Tables.events(spark, TestSpark.sfDir)
    assert(e.schema("ts").dataType == TimestampType,
      s"events.ts must read as TimestampType, got ${e.schema("ts").dataType}")
    val o = Tables.orders(spark, TestSpark.sfDir)
    assert(o.schema("o_orderdate").dataType == TimestampType)
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    assert(li.schema("l_shipdate").dataType == TimestampType)
  }

  test("unix_micros works on the read ts and spans a sane event-time range") {
    val bounds = Tables.events(spark, TestSpark.sfDir)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(lo < hi, "event time must span a range")
    // events are synthetic 2020s-era data: both bounds in (2000, 2100)
    val y2000 = 946684800000000L
    val y2100 = 4102444800000000L
    assert(lo > y2000 && hi < y2100, s"epoch-micros bounds out of range: $lo..$hi")
  }

  test("the compat conf survives: a raw read in the same session agrees with Tables") {
    Tables.ensureTimestampCompat(spark)
    val raw = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    assert(raw.schema("ts").dataType == TimestampType)
    assert(raw.schema("ts").dataType != TimestampNTZType)
  }
}
