package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Feed-driven incremental view maintenance: signed deltas from the change
  * feed must maintain a (count, sum) mart to exactly the from-scratch
  * state — including removing a mart row whose group empties out. */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mart(df: DataFrame): DataFrame =
    df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(20,2)")).cast("double").as("v_sum"))

  private def rows(df: DataFrame): Set[(String, Long, Double)] =
    df.select("g", "n", "v_sum").as[(String, Long, Double)].collect().toSet

  private val base = Seq(
    ("k1", "a", 10.0), ("k2", "a", 20.0),
    ("k3", "b", 30.0), ("k4", "c", 40.0))

  test("merge feed deltas maintain the mart to the from-scratch state") {
    val target = base.toDF("k", "g", "v")
    // update k1 (+5), move k3 from group b to a, insert k9 into c
    val src = Seq(("k1", "a", 15.0), ("k3", "a", 30.0), ("k9", "c", 90.0))
      .toDF("k", "g", "v")
    val feed = ChangeFeed.mergeFeed(target, src, Seq("k"))
    val delta = ChangeFeed.martDelta(feed, Seq("g"), Seq("v"))
    val maintained = ChangeFeed.applyMartDelta(
      mart(target), delta, Seq("g"), "n", Map("v_sum" -> "v"))
    val scratch = mart(ChangeFeed.applyChangeFeed(target, feed, Seq("k")))
    assert(rows(maintained) == rows(scratch))
    // group b emptied (k3 moved away): its mart row must be gone
    assert(!rows(maintained).exists(_._1 == "b"))
    assert(rows(maintained) == Set(("a", 3L, 65.0), ("c", 2L, 130.0)))
  }

  test("delete feed deltas remove emptied groups") {
    val target = base.toDF("k", "g", "v")
    val feed = ChangeFeed.deleteFeed(target, Seq("k3").toDF("k"), Seq("k"))
    val delta = ChangeFeed.martDelta(feed, Seq("g"), Seq("v"))
    val maintained = ChangeFeed.applyMartDelta(
      mart(target), delta, Seq("g"), "n", Map("v_sum" -> "v"))
    assert(rows(maintained) == Set(("a", 2L, 30.0), ("c", 1L, 40.0)))
  }

  test("a brand-new group appears via the full-outer delta join") {
    val target = base.toDF("k", "g", "v")
    val src = Seq(("k9", "z", 9.0)).toDF("k", "g", "v")
    val feed = ChangeFeed.mergeFeed(target, src, Seq("k"))
    val delta = ChangeFeed.martDelta(feed, Seq("g"), Seq("v"))
    val maintained = ChangeFeed.applyMartDelta(
      mart(target), delta, Seq("g"), "n", Map("v_sum" -> "v"))
    assert(rows(maintained).contains(("z", 1L, 9.0)))
  }
}
