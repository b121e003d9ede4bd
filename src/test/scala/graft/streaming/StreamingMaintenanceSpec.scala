package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Continuous materialized-view maintenance: stream of updates -> per-batch
  * MERGE into the partitioned fact + incremental mart refresh. The final
  * state must equal applying every update then recomputing the mart from
  * scratch — and partitions never touched by any batch keep their files.
  */
class StreamingMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val martAgg = (df: DataFrame) =>
    df.groupBy("p").agg(count(lit(1)).as("n"), sum("v").cast("double").as("v_sum"))

  test("streamed merges + refreshes converge to the from-scratch state") {
    val fact = Files.createTempDirectory("smm-fact").toFile.getAbsolutePath
    val mart = Files.createTempDirectory("smm-mart").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("smm-stage").toFile.getAbsolutePath
    val updates = Files.createTempDirectory("smm-upd").toFile.getAbsolutePath
    val checkpoint = Files.createTempDirectory("smm-ckpt").toFile.getAbsolutePath

    Seq(("k1", 10.0, "p0"), ("k2", 20.0, "p0"), ("k3", 30.0, "p1"),
        ("k4", 40.0, "p1"), ("k5", 50.0, "p2"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(fact)
    martAgg(spark.read.parquet(fact)).write.mode("overwrite")
      .option("partitionOverwriteMode", "static").partitionBy("p").parquet(mart)
    val martP1Before = new java.io.File(mart, "p=p1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified()).toSeq

    // two update files -> two micro-batches (maxFilesPerTrigger = 1):
    // batch A updates k1 and inserts k9 (p0 only);
    // batch B moves k5 from p2 to p0 (p2 empties out)
    Seq(("k1", 11.0, "p0"), ("k9", 90.0, "p0")).toDF("k", "v", "p")
      .coalesce(1).write.mode("append").parquet(updates)
    Seq(("k5", 55.0, "p0")).toDF("k", "v", "p")
      .coalesce(1).write.mode("append").parquet(updates)

    StreamingJobs.streamingMartMaintenance(spark, updates, fact, mart,
      staging, checkpoint, Seq("k"), "p", martAgg)

    val factGot = spark.read.parquet(fact).select("k", "v", "p")
      .as[(String, Double, String)].collect().toSet
    assert(factGot == Set(
      ("k1", 11.0, "p0"), ("k2", 20.0, "p0"), ("k9", 90.0, "p0"),
      ("k5", 55.0, "p0"), ("k3", 30.0, "p1"), ("k4", 40.0, "p1")))

    val martGot = spark.read.parquet(mart).select("p", "n", "v_sum")
      .as[(String, Long, Double)].collect().toSet
    val scratch = martAgg(spark.read.parquet(fact)).select("p", "n", "v_sum")
      .as[(String, Long, Double)].collect().toSet
    assert(martGot == scratch)
    assert(martGot == Set(("p0", 4L, 176.0), ("p1", 2L, 70.0)))
    assert(!new java.io.File(mart, "p=p2").exists(), "emptied partition's mart must be removed")

    // p1 was never touched by any batch: its mart files were never rewritten
    val martP1After = new java.io.File(mart, "p=p1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.lastModified()).toSeq
    assert(martP1After == martP1Before)
  }
}
