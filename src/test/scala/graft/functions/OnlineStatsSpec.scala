package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.OnlineStats.Moments

class OnlineStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributed Welford matches the built-in var_pop/avg closely") {
    val xs = (1 to 10000).map(i => (i * 2654435761L % 1000003).toDouble / 997.0)
    val ds = spark.createDataset(xs).repartition(7) // force multi-partition merges
    val m = ds.select(OnlineStats.onlineMoments).head()
    val row = ds.agg(avg("value"), var_pop("value"), count(lit(1))).head()
    assert(m.n == row.getLong(2))
    assert(math.abs(m.mean - row.getDouble(0)) / math.abs(row.getDouble(0)) < 1e-12)
    assert(math.abs(m.variance - row.getDouble(1)) / math.abs(row.getDouble(1)) < 1e-9)
  }

  test("merge is associative-stable regardless of partitioning") {
    val xs = (1 to 5000).map(_.toDouble)
    val results = Seq(1, 3, 16).map { p =>
      spark.createDataset(xs).repartition(p).select(OnlineStats.onlineMoments).head()
    }
    // exact n; mean/m2 agree to near-ulp across partitionings
    assert(results.map(_.n).distinct == Seq(5000L))
    val means = results.map(_.mean)
    assert(means.max - means.min < 1e-9)
    // ground truth: mean of 1..5000 = 2500.5, var_pop = (n^2-1)/12
    assert(math.abs(means.head - 2500.5) < 1e-9)
    assert(math.abs(results.head.variance - (5000.0 * 5000.0 - 1) / 12.0) < 1e-4)
  }

  test("empty and singleton inputs") {
    val empty = spark.createDataset(Seq.empty[Double]).select(OnlineStats.onlineMoments).head()
    assert(empty.n == 0L && empty.variance.isNaN)
    val one = spark.createDataset(Seq(42.0)).select(OnlineStats.onlineMoments).head()
    assert(one.n == 1L && one.mean == 42.0 && one.variance == 0.0 && one.sampleVariance.isNaN)
  }

  test("typed groupBy aggregation per key") {
    val ds = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDS()
    val byKey = ds.groupByKey(_._1)
      .agg(OnlineStats.momentsOf[(Int, Double)](_._2).toColumn)
      .collect().toMap
    assert(byKey(1) == Moments(2, 15.0, 50.0))
    assert(byKey(2).n == 1)
  }
}
