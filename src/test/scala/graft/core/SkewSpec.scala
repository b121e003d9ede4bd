package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows on one hot key
  private def skewed = ((1 to 900).map(i => ("hot", i.toDouble, i.toLong)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble, 900L + i))).toDF("k", "v", "id")

  test("saltedAgg is exact: matches the direct aggregate on count/sum/avg") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"), avg("v").as("avg"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val salted = Skew.saltedAgg(skewed, "k", "v", spreadCol = "id", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, t, a)) =>
      val (dn, dt, da) = direct(k)
      assert(n == dn && math.abs(t - dt) < 1e-9 && math.abs(a - da) < 1e-9, s"key $k")
    }
  }

  test("saltedAgg plans TWO aggregation stages: salt exchange, then key exchange") {
    val plan = Skew.saltedAgg(skewed, "k", "v", spreadCol = "id", saltBuckets = 8)
      .queryExecution.executedPlan.toString
    // stage 1 shuffles on (k, __salt), stage 2 re-shuffles on k alone
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("__salt"), plan)
    // each stage is a partial+final hash aggregate pair
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("withSalt spreads a hot key across buckets deterministically") {
    val salted = Skew.withSalt(skewed.filter($"k" === "hot"), "id", 8)
    val buckets = salted.select(countDistinct("__salt")).head.getLong(0)
    assert(buckets > 4) // hot key now spans most of the 8 buckets
    // deterministic: same input -> same salt assignment
    val again = Skew.withSalt(skewed.filter($"k" === "hot"), "id", 8)
    assert(salted.agg(sum("__salt")).head.getLong(0) == again.agg(sum("__salt")).head.getLong(0))
  }

  test("saltedJoin matches the plain join result") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).agg(count(lit(1)), sum("v")).head
    val salted = Skew.saltedJoin(skewed, dim, "k", spreadCol = "id", saltBuckets = 4)
      .agg(count(lit(1)), sum("v")).head
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-9)
  }

  test("keySkew surfaces the hot key with its fraction") {
    val top = Skew.keySkew(skewed, "k", 1).head
    assert(top.getString(0) == "hot")
    assert(top.getDouble(2) == 0.9)
  }
}
