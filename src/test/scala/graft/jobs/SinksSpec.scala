package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(dir)
  }

  test("writeSizedParquet hits the file-count target per partition value") {
    val out = Files.createTempDirectory("sinks").toFile
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 2).as("p"), (col("id") * 3).as("v"))
    Sinks.writeSizedParquet(df, out.getAbsolutePath, Seq("p"), filesPerPartition = 2,
      maxRecordsPerFile = 100000L)
    val files = parquetFiles(out)
    val byPartition = files.groupBy(_.getParentFile.getName)
    assert(byPartition.keySet == Set("p=0", "p=1"))
    byPartition.values.foreach(fs => assert(fs.size <= 2, s"too many files: $fs"))
    assert(spark.read.parquet(out.getAbsolutePath).count() == 10000)
  }

  test("maxRecordsPerFile splits a hot partition instead of one giant file") {
    val out = Files.createTempDirectory("sinks").toFile
    // all rows share one partition value -> one task -> the cap must split
    val df = spark.range(9000).select(col("id"), lit(0L).as("p"))
    Sinks.writeSizedParquet(df, out.getAbsolutePath, Seq("p"), filesPerPartition = 1,
      maxRecordsPerFile = 2000L)
    val files = parquetFiles(out)
    assert(files.size >= 5, s"cap should split into >= 5 files, got ${files.size}")
    assert(spark.read.parquet(out.getAbsolutePath).count() == 9000)
  }

  test("compactParquet rewrites to the target file count, data intact") {
    val src = Files.createTempDirectory("sinks-src").toFile
    val out = Files.createTempDirectory("sinks-out").toFile
    spark.range(5000).select(col("id"), (col("id") % 97).as("k"))
      .repartition(37) // the small-files mess
      .write.mode("overwrite").parquet(src.getAbsolutePath)
    assert(parquetFiles(src).size > 10)
    Sinks.compactParquet(spark, src.getAbsolutePath, out.getAbsolutePath,
      targetFiles = 2, clusterBy = Seq("k"))
    assert(parquetFiles(out).size == 2)
    val got = spark.read.parquet(out.getAbsolutePath)
    assert(got.count() == 5000)
    assert(got.agg(sum("id")).head.getLong(0) == (0L until 5000L).sum)
  }
}
