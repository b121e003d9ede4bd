package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing: pre-shuffled, co-located storage layout so repeated joins and
  * aggregations on the bucket key run with ZERO exchanges — at 100 TB the
  * difference between re-shuffling 100 TB per join and none (SURVEY.md §4
  * shuffle-minimization checklist).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join to show its shuffle needs
    s
  }

  private def dropStale(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previous JVM's files survive the (in-memory) catalog; remove them
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("join on co-bucketed tables plans without a shuffle exchange") {
    dropStale("li_bucketed")
    dropStale("o_bucketed")
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val o = Tables.orders(spark, TestSpark.sfDir)
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"), s"expected shuffle-free co-located join, got:\n$plan")

    // same join on plain (unbucketed) parquet DOES need exchanges
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plain.contains("Exchange"))

    // and the result matches the plain join
    assert(joined.count() == li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("aggregation on the bucket key also skips the exchange") {
    val agg = spark.table("li_bucketed").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free aggregate, got:\n$plan")
  }
}
