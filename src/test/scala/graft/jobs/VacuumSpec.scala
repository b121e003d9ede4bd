package graft.jobs

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VacuumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vacuum removes crashed-writer debris, keeps data and _SUCCESS") {
    val root = Files.createTempDirectory("vac").toFile.getAbsolutePath
    Seq((1L, "p0"), (2L, "p1")).toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(root)

    // simulate a crashed writer: a _temporary tree inside a partition and
    // an in-progress temp file at the root
    val tmpDir = new java.io.File(s"$root/p=p0/_temporary/0")
    assert(tmpDir.mkdirs())
    Files.writeString(new java.io.File(tmpDir, "part-junk").toPath, "junk")
    Files.writeString(new java.io.File(root, ".stream-commit.tmp").toPath, "junk")

    val before = spark.read.parquet(root).select("id").as[Long].collect().toSet
    val hadSuccess = new java.io.File(root, "_SUCCESS").exists()
    val deleted = Lifecycle.vacuumOrphans(spark, root)

    assert(deleted == 2, s"expected 2 debris entries deleted, got $deleted")
    assert(!new java.io.File(s"$root/p=p0/_temporary").exists())
    assert(!new java.io.File(root, ".stream-commit.tmp").exists())
    assert(new java.io.File(root, "_SUCCESS").exists() == hadSuccess,
      "vacuum must not touch _SUCCESS markers")
    assert(spark.read.parquet(root).select("id").as[Long].collect().toSet == before)
    assert(Lifecycle.vacuumOrphans(spark, root) == 0, "vacuum is idempotent")
  }
}
