package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LifecycleSpec extends AnyFunSuite {
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

  private def freshTarget(root: String): Unit =
    Seq(("k1", 10.0, "p0"), ("k2", 20.0, "p0"),
        ("k3", 30.0, "p1"), ("k4", 40.0, "p1"),
        ("k5", 50.0, "p2"))
      .toDF("k", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)

  test("deleteKeys removes exactly the doomed keys, untouched partitions byte-identical") {
    val root = Files.createTempDirectory("del").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("del-stage").toFile.getAbsolutePath
    freshTarget(root)
    val before = fileSigs(new java.io.File(root))

    val (after, touched) = Lifecycle.deleteKeys(spark, root,
      Seq("k1").toDF("k"), Seq("k"), Seq("p"), staging)

    assert(after.select("k").as[String].collect().toSet == Set("k2", "k3", "k4", "k5"))
    assert(touched == Seq(Seq("p0")))
    val sigs = fileSigs(new java.io.File(root))
    val untouched = before.filterNot(_._1.contains("p=p0"))
    assert(untouched.nonEmpty)
    untouched.foreach { case (path, sig) =>
      assert(sigs.get(path).contains(sig), s"untouched file rewritten or gone: $path")
    }
  }

  test("a fully-emptied partition's directory is removed") {
    val root = Files.createTempDirectory("del").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("del-stage").toFile.getAbsolutePath
    freshTarget(root)

    // p2's only row dies
    val (after, touched) = Lifecycle.deleteKeys(spark, root,
      Seq("k5").toDF("k"), Seq("k"), Seq("p"), staging)

    assert(after.where(col("p") === "p2").count() == 0)
    assert(after.count() == 4)
    assert(touched == Seq(Seq("p2")))
    assert(!new java.io.File(root, "p=p2").exists(),
      "emptied partition dir must be deleted (dynamic overwrite cannot)")
  }

  test("deleting an absent key touches nothing") {
    val root = Files.createTempDirectory("del").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("del-stage").toFile.getAbsolutePath
    freshTarget(root)
    val before = fileSigs(new java.io.File(root))

    val (after, touched) = Lifecycle.deleteKeys(spark, root,
      Seq("nope").toDF("k"), Seq("k"), Seq("p"), staging)

    assert(touched.isEmpty)
    assert(after.count() == 5)
    assert(fileSigs(new java.io.File(root)) == before)
  }

  test("knownPartitions skips the locate scan and confines the rewrite") {
    val root = Files.createTempDirectory("del").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("del-stage").toFile.getAbsolutePath
    freshTarget(root)
    val before = fileSigs(new java.io.File(root))

    val (after, _) = Lifecycle.deleteKeys(spark, root,
      Seq("k3").toDF("k"), Seq("k"), Seq("p"), staging,
      knownPartitions = Some(Seq(Seq("p1"))))

    assert(after.select("k").as[String].collect().toSet == Set("k1", "k2", "k4", "k5"))
    val sigs = fileSigs(new java.io.File(root))
    before.filterNot(_._1.contains("p=p1")).foreach { case (path, sig) =>
      assert(sigs.get(path).contains(sig))
    }
  }

  test("compaction reduces file count, preserves rows, leaves healthy partitions alone") {
    val root = Files.createTempDirectory("compact").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("compact-stage").toFile.getAbsolutePath
    // p0: fragmented into ~8 files; p1: already a single file (healthy)
    val frag = (1 to 400).map(i => (s"a$i", i.toDouble, "p0")).toDF("k", "v", "p")
    frag.repartition(8)
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)
    (1 to 50).map(i => (s"b$i", i.toDouble, "p1")).toDF("k", "v", "p")
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p").parquet(root)
    val before = fileSigs(new java.io.File(root))
    val rowsBefore = spark.read.parquet(root)
      .select("k", "v", "p").as[(String, Double, String)].collect().toSet

    val (nparts, filesBefore, filesAfter) = Lifecycle.compactPartitions(
      spark, root, Seq("p"), targetFileBytes = 64L * 1024 * 1024, staging)

    assert(nparts == 1, "only the fragmented partition should be compacted")
    assert(filesBefore == 8 && filesAfter < filesBefore)
    val rowsAfter = spark.read.parquet(root)
      .select("k", "v", "p").as[(String, Double, String)].collect().toSet
    assert(rowsAfter == rowsBefore, "compaction must preserve the exact row set")
    // the healthy partition was never rewritten
    val sigs = fileSigs(new java.io.File(root))
    before.filter(_._1.contains("p=p1")).foreach { case (path, sig) =>
      assert(sigs.get(path).contains(sig), s"healthy partition rewritten: $path")
    }
  }

  test("compaction handles the null partition (__HIVE_DEFAULT_PARTITION__)") {
    val root = Files.createTempDirectory("compact-null").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("compact-null-stage").toFile.getAbsolutePath
    // fragment BOTH a real partition and the null partition
    (1 to 40).map(i => (s"k$i", i * 1.0, if (i % 2 == 0) "p0" else null))
      .toDF("k", "v", "p")
      .repartition(10)
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)
    val before = Lifecycle.listPartitionFiles(spark, root, Seq("p"))
    assert(before.exists(_.values == Seq("__HIVE_DEFAULT_PARTITION__")),
      "setup must produce a null partition")
    assert(before.forall(_.files > 1), s"both partitions must be fragmented: $before")

    val (nparts, nBefore, nAfter) = Lifecycle.compactPartitions(
      spark, root, Seq("p"), targetFileBytes = 64L * 1024 * 1024, staging)

    assert(nparts == 2 && nBefore == before.map(_.files).sum && nAfter == 2,
      s"both partitions incl. the null one must compact: ($nparts, $nBefore, $nAfter)")
    val after = Lifecycle.listPartitionFiles(spark, root, Seq("p"))
    assert(after.forall(_.files == 1),
      s"the null partition must not silently stay fragmented: $after")
    // and the row set survived exactly, nulls intact
    val rows = spark.read.parquet(root)
    assert(rows.count() == 40 && rows.where(col("p").isNull).count() == 20)
  }

  test("retention expiry drops matching partitions without touching survivors") {
    val root = Files.createTempDirectory("ttl").toFile.getAbsolutePath
    freshTarget(root)
    val before = fileSigs(new java.io.File(root))

    val dropped = Lifecycle.expirePartitions(spark, root, Seq("p"), _.head == "p0")

    assert(dropped == Seq(Seq("p0")))
    assert(!new java.io.File(root, "p=p0").exists())
    val after = fileSigs(new java.io.File(root))
    before.filterNot(_._1.contains("p=p0")).foreach { case (path, sig) =>
      assert(after.get(path).contains(sig), s"survivor rewritten: $path")
    }
    assert(spark.read.parquet(root).select("k").as[String].collect().toSet
      == Set("k3", "k4", "k5"))
  }

  test("listPartitionFiles parses multi-level partition values") {
    val root = Files.createTempDirectory("list").toFile.getAbsolutePath
    Seq((1L, "2024", "1"), (2L, "2024", "2"), (3L, "2025", "1"))
      .toDF("id", "y", "m")
      .write.mode("overwrite").partitionBy("y", "m").parquet(root)
    val parts = Lifecycle.listPartitionFiles(spark, root, Seq("y", "m"))
    assert(parts.map(_.values).toSet ==
      Set(Seq("2024", "1"), Seq("2024", "2"), Seq("2025", "1")))
    assert(parts.forall(p => p.files >= 1 && p.bytes > 0))
  }
}
