package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CONVERT TO GRAFT: adopt an existing plain-parquet directory as a
  * snapshot table in place — zero data movement, full table-format
  * surface afterwards (reads, pruning, DML, time travel, vacuum). */
class ConvertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cnv").toFile.getAbsolutePath + "/t"

  private def md5s(root: String): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.filterNot(_.getName.startsWith("_")).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet")).map { f =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
      f.getAbsolutePath -> h
    }.toMap
  }

  test("convert adopts a partitioned parquet dir in place; pruning, DML and time travel follow") {
    val root = tmp()
    (1L to 300L).map(i => (i, (2024 + (i % 2)).toInt, i * 1.0)).toDF("k", "year", "v")
      .write.partitionBy("year").parquet(root)
    val before = md5s(root)
    assert(before.nonEmpty)

    val v = spark.sql(s"CONVERT TO GRAFT graft.`$root` PARTITIONED BY (year)")
      .as[Long].head()
    assert(v == 0L)
    assert(md5s(root) == before, "conversion moves ZERO bytes")

    // full content through the catalog door
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$root`").as[Long].head() == 300L)
    // partition pruning works off the adopted layout
    val cands = Snapshots.statsCandidateFiles(spark, root, 0, "year = 2024")
    assert(cands.nonEmpty && cands.forall(_.contains("year=2024")))

    // DML post-convert: one-partition SQL delete, then time travel back
    spark.sql(s"DELETE FROM graft.`$root` WHERE year = 2025")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$root`").as[Long].head() == 150L)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$root` VERSION AS OF 0")
      .as[Long].head() == 300L, "the adopted files still serve v0")
    assert(md5s(root).keySet.intersect(before.keySet) == before.keySet,
      "original files survive the delete (COW supersedes, never mutates)")

    // converting twice is refused
    intercept[IllegalArgumentException](
      Snapshots.convertToSnapshot(spark, root))
  }

  test("converting a partitioned dir WITHOUT declaring its partition columns is refused") {
    val root = tmp()
    (1L to 100L).map(i => (i, (2024 + (i % 2)).toInt, i * 1.0)).toDF("k", "year", "v")
      .write.partitionBy("year").parquet(root)
    // silently adopting would record `year` in the schema but not the
    // partition property — reads would null-fill it (wrong results)
    val e = intercept[IllegalArgumentException](
      Snapshots.convertToSnapshot(spark, root))
    assert(e.getMessage.contains("year"))
    // declaring it converts fine, and the column reads back non-null
    Snapshots.convertToSnapshot(spark, root, partitionBy = Seq("year"))
    assert(Snapshots.readVersion(spark, root)
      .where(col("year").isNull).isEmpty)
  }

  test("convert an unpartitioned dir; stats envelopes enable skipping immediately") {
    val root = tmp()
    (1L to 300L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartitionByRange(3, col("k")).sortWithinPartitions("k")
      .write.parquet(root)
    Snapshots.convertToSnapshot(spark, root)
    assert(Snapshots.readVersion(spark, root).count() == 300)
    // the conversion's footer-derived #stats: lines prune candidates
    assert(Snapshots.statsCandidateFiles(spark, root, 0, "k <= 50").size == 1,
      "file skipping works from the conversion commit's envelopes")
    Snapshots.append(spark, root, Seq((1000L, 1.0)).toDF("k", "v"))
    assert(Snapshots.readVersion(spark, root).count() == 301)
  }
}
