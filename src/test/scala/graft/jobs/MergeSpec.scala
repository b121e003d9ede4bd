package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** path -> (mtime, content md5): equality means the file was never
    * rewritten, not merely rewritten with the same bytes. */
  private def fileBytes(dir: java.io.File): Map[String, (Long, String)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet")).map { f =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
      f.getAbsolutePath -> (f.lastModified() -> md5)
    }.toMap
  }

  private def freshTarget(root: String): Unit =
    Seq(("k1", 1L, 10.0, "p0"), ("k2", 2L, 20.0, "p0"),
        ("k3", 3L, 30.0, "p1"), ("k4", 4L, 40.0, "p1"),
        ("k5", 5L, 50.0, "p2"))
      .toDF("k", "seq", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)

  test("merge updates matched, inserts unmatched, leaves untouched partitions byte-identical") {
    val root = Files.createTempDirectory("merge").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("merge-stage").toFile.getAbsolutePath
    freshTarget(root)
    val before = fileBytes(new java.io.File(root))

    // update k1 (stays in p0), insert k9 into p0 — p1 and p2 untouched
    val src = Seq(("k1", 100L, 11.0, "p0"), ("k9", 9L, 90.0, "p0"))
      .toDF("k", "seq", "v", "p")
    val merged = Merge.mergeIntoPartitioned(spark, root, src, Seq("k"), "p", staging)

    val got = merged.select("k", "seq", "v", "p").as[(String, Long, Double, String)]
      .collect().toSet
    assert(got == Set(
      ("k1", 100L, 11.0, "p0"), ("k2", 2L, 20.0, "p0"), ("k9", 9L, 90.0, "p0"),
      ("k3", 3L, 30.0, "p1"), ("k4", 4L, 40.0, "p1"), ("k5", 5L, 50.0, "p2")))

    // untouched partitions: same files, same mtime + bytes (never rewritten)
    val after = fileBytes(new java.io.File(root))
    val untouched = before.filterNot(_._1.contains("p=p0"))
    assert(untouched.nonEmpty)
    untouched.foreach { case (path, sig) =>
      assert(after.get(path).contains(sig), s"untouched file rewritten or gone: $path")
    }
    // the touched partition WAS rewritten (its old file set is gone or changed)
    val p0Before = before.filter(_._1.contains("p=p0"))
    assert(p0Before.exists { case (path, sig) => !after.get(path).contains(sig) })
  }

  test("a partition-moving update departs its old partition") {
    val root = Files.createTempDirectory("merge").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("merge-stage").toFile.getAbsolutePath
    freshTarget(root)

    // k5 moves p2 -> p0: p2 loses its only row, p0 gains it
    val src = Seq(("k5", 55L, 51.0, "p0")).toDF("k", "seq", "v", "p")
    val merged = Merge.mergeIntoPartitioned(spark, root, src, Seq("k"), "p", staging)

    assert(merged.where(col("p") === "p2").count() == 0)
    assert(merged.where(col("k") === "k5").select("p", "seq").as[(String, Long)]
      .collect().toSeq == Seq(("p0", 55L)))
    assert(merged.count() == 5)
  }

  test("detectMoves=false skips the departure scan (rows known not to move)") {
    val root = Files.createTempDirectory("merge").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("merge-stage").toFile.getAbsolutePath
    freshTarget(root)

    val src = Seq(("k3", 33L, 31.0, "p1")).toDF("k", "seq", "v", "p")
    val merged = Merge.mergeIntoPartitioned(spark, root, src, Seq("k"), "p", staging,
      detectMoves = false)
    assert(merged.where(col("k") === "k3").select("seq").as[Long].head() == 33L)
    assert(merged.count() == 5)
  }

  test("multi-level year/month partitioning: only the touched month is rewritten") {
    val root = Files.createTempDirectory("merge-ym").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("merge-ym-stage").toFile.getAbsolutePath
    Seq(("k1", 1.0, 2024, 1), ("k2", 2.0, 2024, 1),
        ("k3", 3.0, 2024, 2), ("k4", 4.0, 2025, 1))
      .toDF("k", "v", "year", "month")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("year", "month").parquet(root)
    val before = fileBytes(new java.io.File(root))

    // update k1 in 2024/01 and move k3 from 2024/02 -> 2025/01
    val src = Seq(("k1", 10.0, 2024, 1), ("k3", 30.0, 2025, 1))
      .toDF("k", "v", "year", "month")
    val (merged, touched) = Merge.mergeIntoPartitionedColsTouched(spark, root, src,
      Seq("k"), Seq("year", "month"), staging)

    assert(touched.map(_.map(String.valueOf)).toSet ==
      Set(Seq("2024", "1"), Seq("2024", "2"), Seq("2025", "1")))
    val got = merged.select("k", "v", "year", "month")
      .as[(String, Double, Int, Int)].collect().toSet
    assert(got == Set(("k1", 10.0, 2024, 1), ("k2", 2.0, 2024, 1),
      ("k3", 30.0, 2025, 1), ("k4", 4.0, 2025, 1)))
    // 2024/02 emptied out entirely -> its nested dir is gone
    assert(!new java.io.File(root, "year=2024/month=2").exists())
    // nothing else exists outside the three touched partitions... and had
    // any partition NOT been touched, it would be byte-identical:
    val after = fileBytes(new java.io.File(root))
    before.filter(_._1.contains("year=2025")).foreach { case (path, sig) =>
      // 2025/01 WAS touched (receives k3) so it must differ or be replaced
      assert(!after.get(path).contains(sig) || !after.contains(path))
    }
  }

  test("untouched sibling months stay byte-identical under multi-level merge") {
    val root = Files.createTempDirectory("merge-ym2").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("merge-ym2-stage").toFile.getAbsolutePath
    Seq(("k1", 1.0, 2024, 1), ("k2", 2.0, 2024, 2), ("k3", 3.0, 2025, 1))
      .toDF("k", "v", "year", "month")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("year", "month").parquet(root)
    val before = fileBytes(new java.io.File(root))

    val src = Seq(("k9", 9.0, 2024, 1)).toDF("k", "v", "year", "month")
    Merge.mergeIntoPartitionedColsTouched(spark, root, src,
      Seq("k"), Seq("year", "month"), staging, detectMoves = false)

    val after = fileBytes(new java.io.File(root))
    val untouched = before.filterNot(_._1.contains("year=2024/month=1"))
    assert(untouched.nonEmpty)
    untouched.foreach { case (path, sig) =>
      assert(after.get(path).contains(sig), s"untouched month rewritten: $path")
    }
  }

  test("empty source is a no-op") {
    val root = Files.createTempDirectory("merge").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("merge-stage").toFile.getAbsolutePath
    freshTarget(root)
    val src = Seq.empty[(String, Long, Double, String)].toDF("k", "seq", "v", "p")
    val merged = Merge.mergeIntoPartitioned(spark, root, src, Seq("k"), "p", staging)
    assert(merged.count() == 5)
  }
}
