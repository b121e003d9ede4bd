package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SynthSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def read(rows: Int = 1000, parts: Int = 4) =
    spark.read.format("graft.sources.SynthSource")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  test("full scan: row count, deterministic content, declared partitioning") {
    val df = read()
    assert(df.count() == 1000)
    assert(SynthSource.lastPlannedPartitions.get() == 4)
    val r = df.where($"id" === 7L).select("etype", "value").head()
    assert(r.getString(0) == SynthSource.etypeOf(7L))
    assert(r.getDouble(1) == SynthSource.valueOf(7L))
    // rereads are bit-identical (pure function of id): retry/speculation-safe
    assert(df.agg(sum("value")).head.getDouble(0) == read().agg(sum("value")).head.getDouble(0))
  }

  test("filter pushdown prunes whole input partitions at planning time") {
    val df = read().where($"id" >= 750L)
    assert(df.count() == 250)
    // ids 750..999 live entirely in the last of 4 x 250-id partitions
    assert(SynthSource.lastPlannedPartitions.get() == 1,
      s"expected 1 planned partition, got ${SynthSource.lastPlannedPartitions.get()}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(id,750)"),
      s"pushed filter missing from scan description:\n$plan")

    val mid = read().where($"id" >= 260L && $"id" < 510L)
    assert(mid.count() == 250)
    assert(SynthSource.lastPlannedPartitions.get() == 2) // spans partitions 1 and 2
  }

  test("non-range predicates are rejected back to Spark and still correct") {
    val df = read().where($"etype" === "click" && $"id" < 500L)
    val expected = (0L until 500L).count(SynthSource.etypeOf(_) == "click")
    assert(df.count() == expected)
    assert(SynthSource.lastPlannedPartitions.get() == 2) // id < 500 pruned half
  }

  test("column pruning reaches the reader") {
    val df = read().select("etype")
    assert(df.schema.fieldNames.toSeq == Seq("etype"))
    assert(df.distinct().count() <= 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<etype:string>"),
      s"reader schema not pruned:\n$plan")
  }
}
