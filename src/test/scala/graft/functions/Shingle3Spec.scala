package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class Shingle3Spec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    Shingle3.register(s)
    s
  }

  private val hofShingles =
    """CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2),
      |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
      |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin

  test("matches the higher-order-function formulation on real documents") {
    val d = Tables.documents(spark, TestSpark.sfDir)
      .withColumn("toks", split(col("text"), " "))
    val mismatches = d.select(
      expr("shingle3(toks)").as("native"),
      expr(hofShingles).as("hof")
    ).filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("edge cases: under 3 tokens -> empty, exactly 3 -> one shingle") {
    import spark.implicits._
    val df = Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "b", "c", "d"))
      .toDF("toks")
    val out = df.select(expr("shingle3(toks)")).collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2) == Seq("a b c"))
    assert(out(3) == Seq("a b c", "b c d"))
  }

  test("stays inside WholeStageCodegen") {
    val d = Tables.documents(spark, TestSpark.sfDir)
      .select(expr("shingle3(split(text, ' '))").as("sh"))
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"))
  }
}
