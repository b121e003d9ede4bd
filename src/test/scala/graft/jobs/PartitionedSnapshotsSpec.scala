package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hive-partitioned snapshot tables: partition values ride the data-file
  * paths (`graft.partitionBy` table property), every read path
  * materializes them, `replaceWhere`/`overwritePartitions` replace
  * exactly the claimed partitions as ONE commit with every other file
  * carried by reference, and partition-scoped OPTIMIZE never plans a
  * file outside its predicate. */
class PartitionedSnapshotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("psnap").toFile.getAbsolutePath + "/t"

  private def sample = Seq(
    (1L, 2024, 1, "a"), (2L, 2024, 1, "b"),
    (3L, 2024, 2, "c"), (4L, 2024, 2, "d"),
    (5L, 2025, 1, "e")).toDF("k", "year", "month", "s")

  private val pprops = Map("graft.partitionBy" -> "year,month")

  test("init writes Hive layout; readVersion restores partition columns and order") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    val files = Snapshots.versionFiles(spark, root)
    assert(files.forall(f => f.contains("year=") && f.contains("month=")),
      s"partition values must ride the paths: $files")
    val back = Snapshots.readVersion(spark, root)
    assert(back.columns.toSeq == Seq("k", "year", "month", "s"),
      "logical column order preserved (partition cols NOT forced last)")
    assert(back.as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq ==
      sample.as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq)
    assert(Snapshots.partitionColumns(spark, root) == Seq("year", "month"))
  }

  test("append keeps the layout; merge and delete COW preserve partition values") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    Snapshots.append(spark, root, Seq((6L, 2025, 2, "f")).toDF("k", "year", "month", "s"))
    assert(Snapshots.versionFiles(spark, root).exists(_.contains("year=2025/month=2")))
    // merge rewrites only files holding matched keys; partition values intact
    Snapshots.mergeCow(spark, root,
      Seq((1L, 2024, 1, "A")).toDF("k", "year", "month", "s"), Seq("k"))
    val afterMerge = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(afterMerge == Seq((1L, 2024, 1, "A"), (2L, 2024, 1, "b"),
      (3L, 2024, 2, "c"), (4L, 2024, 2, "d"), (5L, 2025, 1, "e"), (6L, 2025, 2, "f")))
    Snapshots.deleteKeysCow(spark, root, Seq(3L).toDF("k"), Seq("k"))
    val afterDelete = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(afterDelete.map(_._1) == Seq(1L, 2L, 4L, 5L, 6L))
    assert(afterDelete.find(_._1 == 4L).get == ((4L, 2024, 2, "d")))
  }

  test("replaceWhere replaces exactly the matching partitions as one commit") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    val before = Snapshots.versionFiles(spark, root).map(_.split("/data/").last)
    val repl = Seq((30L, 2024, 2, "C2"), (40L, 2024, 2, "D2"))
      .toDF("k", "year", "month", "s")
    val v = Snapshots.replaceWhere(spark, root, repl, "year = 2024 AND month = 2")
    assert(v == 1L)
    val head = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(head == Seq((1L, 2024, 1, "a"), (2L, 2024, 1, "b"),
      (30L, 2024, 2, "C2"), (40L, 2024, 2, "D2"), (5L, 2025, 1, "e")).sortBy(_._1))
    // files of untouched partitions carry over BY REFERENCE (same entries)
    val after = Snapshots.versionFiles(spark, root, 1).map(_.split("/data/").last)
    val untouchedBefore = before.filterNot(_.contains("year=2024/month=2"))
    assert(untouchedBefore.forall(after.contains),
      "untouched partitions' manifest entries must be identical")
    // history intact: the pre-replace version still reads exactly
    assert(Snapshots.readVersion(spark, root, 0).count() == 5)
    // a batch row OUTSIDE the predicate is refused before any commit
    intercept[IllegalArgumentException] {
      Snapshots.replaceWhere(spark, root,
        Seq((9L, 2025, 1, "x")).toDF("k", "year", "month", "s"),
        "year = 2024 AND month = 2")
    }
    // data-column predicates are refused loudly (file-grain unanswerable)
    intercept[IllegalArgumentException] {
      Snapshots.replaceWhere(spark, root, repl, "s = 'c'")
    }
  }

  test("overwritePartitions (dynamic) replaces exactly the partitions present in the batch") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    val batch = Seq((10L, 2024, 1, "A"), (50L, 2025, 1, "E"))
      .toDF("k", "year", "month", "s")
    Snapshots.overwritePartitions(spark, root, batch)
    val head = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(head == Seq((3L, 2024, 2, "c"), (4L, 2024, 2, "d"),
      (10L, 2024, 1, "A"), (50L, 2025, 1, "E")).sortBy(_._1),
      s"only (2024,1) and (2025,1) replaced: $head")
  }

  test("partitioned streaming tail and incremental sync carry partition values") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    Snapshots.append(spark, root, Seq((7L, 2025, 3, "g")).toDF("k", "year", "month", "s"))
    val (batch, n) = TableSync.appendsBetween(spark, root, 0, 1)
    assert(n >= 1)
    assert(batch.as[(Long, Int, Int, String)].collect().toSeq == Seq((7L, 2025, 3, "g")))
  }

  test("optimizeCompact on a partitioned table keeps values; scoped OPTIMIZE stays inside its predicate") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    (8L to 9L).foreach(i => Snapshots.append(spark, root,
      Seq((i, 2024, 1, s"x$i")).toDF("k", "year", "month", "s")))
    val rows0 = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    val v = Snapshots.optimizeCompact(spark, root, smallerThanBytes = 10L * 1024 * 1024)
    assert(v > 0)
    val rows1 = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(rows1 == rows0, "compaction is a logical no-op, partition values intact")
  }

  test("OPTIMIZE WHERE: maintenance touches only the matching partitions' files") {
    val root = tmp()
    Snapshots.init(spark, root, sample, pprops)
    // fragment (2024,1) with two extra single-row appends
    (8L to 9L).foreach(i => Snapshots.append(spark, root,
      Seq((i, 2024, 1, s"x$i")).toDF("k", "year", "month", "s")))
    val head = Snapshots.latestVersion(spark, root)
    val before = Snapshots.versionFiles(spark, root, head).map(_.split("/data/").last)
    val outside = before.filterNot(_.contains("year=2024/month=1"))
    val v = Snapshots.optimizeCompact(spark, root,
      smallerThanBytes = 10L * 1024 * 1024,
      where = Some("year = 2024 AND month = 1"))
    assert(v > 0)
    // the delta's removes are all inside the predicate's partitions
    val d = Snapshots.history(spark, root).where(col("version") === v).head()
    assert(d.getAs[String]("op") == "optimize")
    val after = Snapshots.versionFiles(spark, root, v).map(_.split("/data/").last)
    assert(outside.forall(after.contains),
      "files outside the predicate are untouched entries in the new manifest")
    assert(after.count(_.contains("year=2024/month=1")) <
      before.count(_.contains("year=2024/month=1")),
      "the matching partition's small files were packed")
    val rows = Snapshots.readVersion(spark, root)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == (Seq(1L, 2L, 3L, 4L, 5L) ++ Seq(8L, 9L)).sorted)

    // zorder scoped to one partition leaves the others' entries alone
    val root2 = tmp()
    Snapshots.init(spark, root2,
      (1L to 200L).map(i => (i, (i % 2).toInt, i % 16, (i * 7) % 16))
        .toDF("k", "p", "a", "b"), Map("graft.partitionBy" -> "p"))
    val b2 = Snapshots.versionFiles(spark, root2, 0).map(_.split("/data/").last)
    val out2 = b2.filterNot(_.contains("p=1"))
    val v2 = Snapshots.optimizeZorderCow(spark, root2, "a", "b",
      cellDiv = 16L, numFiles = 2, where = Some("p = 1"))
    val a2 = Snapshots.versionFiles(spark, root2, v2).map(_.split("/data/").last)
    assert(out2.forall(a2.contains), "p=0 files carried by reference under zorder WHERE")
    assert(Snapshots.readVersion(spark, root2).count() == 200)
  }
}
