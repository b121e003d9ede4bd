package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketed signature tables (VERDICT r1 item 8 / NOTES item 5): the
  * MinHash/SimHash band self-join — the per-sweep hot join of the dedup
  * pipelines — must plan WITHOUT a shuffle Exchange when the band tables
  * are persisted bucketed on the join key, and must produce the same
  * candidate pairs as the in-query (unbucketed) path.
  */
class BucketedSignaturesSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // surface the join's real shuffle needs
    s
  }

  private def dropStale(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("minhash band self-join over the bucketed table plans with no Exchange") {
    dropStale("mh_bands_bucketed")
    Signatures.writeMinhashBands(spark, TestSpark.sfDir)

    val join = Signatures.bandSelfJoin(spark, "mh_bands_bucketed")
    val plan = join.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free co-bucketed band join, got:\n$plan")

    // parity: bucketed candidates == the in-query mh_cand stage's pairs
    val bucketed = Signatures.minhashCandidates(spark)
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val inQuery = spark.sql(ExtSql.dedupMinhashLshStaged.stages.find(_._1 == "mh_cand").get._2(SparkSql))
      .orderBy("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bucketed.nonEmpty && bucketed.sameElements(inQuery))
  }

  test("simhash band self-join over the bucketed table plans with no Exchange") {
    dropStale("sh_bands_bucketed")
    Signatures.writeSimhashBands(spark, TestSpark.sfDir)

    val join = Signatures.bandSelfJoin(spark, "sh_bands_bucketed")
    val plan = join.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free co-bucketed band join, got:\n$plan")

    val cands = Signatures.simhashCandidates(spark)
    assert(cands.count() > 0)
    assert(cands.filter(col("hamming") > 3).isEmpty)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
