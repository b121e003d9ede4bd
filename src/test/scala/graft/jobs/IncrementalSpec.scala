package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fileSigs(dir: java.io.File): Map[String, (Long, String)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet")).map { f =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
      f.getAbsolutePath -> (f.lastModified() -> md5)
    }.toMap
  }

  private val martAgg = (df: DataFrame) =>
    df.groupBy("p").agg(count(lit(1)).as("n"), sum("v").cast("double").as("v_sum"))

  private def setup(): (String, String, String) = {
    val fact = Files.createTempDirectory("incr-fact").toFile.getAbsolutePath
    val mart = Files.createTempDirectory("incr-mart").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("incr-stage").toFile.getAbsolutePath
    Seq(("k1", 10.0, "p0"), ("k2", 20.0, "p0"), ("k3", 30.0, "p1"),
        ("k4", 40.0, "p1"), ("k5", 50.0, "p2"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(fact)
    martAgg(spark.read.parquet(fact)).write.mode("overwrite")
      .option("partitionOverwriteMode", "static").partitionBy("p").parquet(mart)
    (fact, mart, staging)
  }

  test("refresh of the touched partition equals a from-scratch recompute; untouched mart files untouched") {
    val (fact, mart, staging) = setup()
    val before = fileSigs(new java.io.File(mart))

    val src = Seq(("k1", 11.0, "p0"), ("k9", 90.0, "p0")).toDF("k", "v", "p")
    Merge.mergeIntoPartitioned(spark, fact, src, Seq("k"), "p", staging,
      detectMoves = false)
    Incremental.refreshPartitions(spark, fact, mart, "p", Seq("p0"), martAgg)

    val got = spark.read.parquet(mart).select("p", "n", "v_sum")
      .as[(String, Long, Double)].collect().toSet
    val scratch = martAgg(spark.read.parquet(fact)).select("p", "n", "v_sum")
      .as[(String, Long, Double)].collect().toSet
    assert(got == scratch)
    assert(got == Set(("p0", 3L, 121.0), ("p1", 2L, 70.0), ("p2", 1L, 50.0)))

    val after = fileSigs(new java.io.File(mart))
    before.filterNot(_._1.contains("p=p0")).foreach { case (path, sig) =>
      assert(after.get(path).contains(sig), s"untouched mart file rewritten: $path")
    }
  }

  test("a partition whose fact rows all vanish loses its mart directory") {
    val (fact, mart, staging) = setup()
    // k5 moves p2 -> p0: p2's fact partition empties out
    val src = Seq(("k5", 55.0, "p0")).toDF("k", "v", "p")
    Merge.mergeIntoPartitioned(spark, fact, src, Seq("k"), "p", staging)
    Incremental.refreshPartitions(spark, fact, mart, "p", Seq("p0", "p2"), martAgg)

    val got = spark.read.parquet(mart).select("p", "n", "v_sum")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("p0", 3L, 85.0), ("p1", 2L, 70.0)))
    assert(!new java.io.File(mart, "p=p2").exists())
  }

  test("multi-level year/month mart refresh follows a cross-month merge exactly") {
    val fact = Files.createTempDirectory("incr-ym-fact").toFile.getAbsolutePath
    val mart = Files.createTempDirectory("incr-ym-mart").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("incr-ym-stage").toFile.getAbsolutePath
    val ymAgg = (df: DataFrame) =>
      df.groupBy("year", "month")
        .agg(count(lit(1)).as("n"), sum("v").cast("double").as("v_sum"))
    Seq(("k1", 1.0, 2024, 1), ("k2", 2.0, 2024, 2), ("k3", 3.0, 2025, 1))
      .toDF("k", "v", "year", "month")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("year", "month").parquet(fact)
    ymAgg(spark.read.parquet(fact)).write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("year", "month").parquet(mart)
    val before = fileSigs(new java.io.File(mart))

    // k2 moves 2024/02 -> 2024/01: 02's fact (and mart) partition empties
    val src = Seq(("k2", 20.0, 2024, 1)).toDF("k", "v", "year", "month")
    val (_, touched) = Merge.mergeIntoPartitionedColsTouched(spark, fact, src,
      Seq("k"), Seq("year", "month"), staging)
    Incremental.refreshPartitionCols(spark, fact, mart,
      Seq("year", "month"), touched, ymAgg)

    val got = spark.read.parquet(mart).select("year", "month", "n", "v_sum")
      .as[(Int, Int, Long, Double)].collect().toSet
    val scratch = ymAgg(spark.read.parquet(fact)).select("year", "month", "n", "v_sum")
      .as[(Int, Int, Long, Double)].collect().toSet
    assert(got == scratch)
    assert(got == Set((2024, 1, 2L, 21.0), (2025, 1, 1L, 3.0)))
    assert(!new java.io.File(mart, "year=2024/month=2").exists())
    // 2025/01 untouched by the merge: its mart files survive byte-identical
    before.filter(_._1.contains("year=2025")).foreach { case (path, sig) =>
      assert(fileSigs(new java.io.File(mart)).get(path).contains(sig))
    }
  }

  test("an aggregation that drops the partition column is rejected") {
    val (fact, mart, staging) = setup()
    intercept[IllegalArgumentException] {
      Incremental.refreshPartitions(spark, fact, mart, "p", Seq("p0"),
        df => df.agg(count(lit(1)).as("n")))
    }
    ()
  }
}
