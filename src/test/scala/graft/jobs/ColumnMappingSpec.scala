package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column mapping on the snapshot log: RENAME/DROP COLUMN are
  * metadata-only commits (physical names frozen in field metadata, files
  * never rewritten), time travel reads each version under its own
  * names, and a reborn column can never resurrect a dropped column's
  * bytes. */
class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cmap").toFile.getAbsolutePath + "/t"

  test("rename is metadata-only; head reads new name, old versions the old; appends keep working") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0, s"s$i")).toDF("k", "v", "s")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    val filesBefore = Snapshots.versionFiles(spark, root, 0)

    val v1 = Snapshots.renameColumn(spark, root, "v", "amount")
    assert(v1 == 1L)
    // zero data movement
    assert(Snapshots.versionFiles(spark, root, 1).toSet == filesBefore.toSet)
    val h = Snapshots.history(spark, root).where(col("version") === 1).head()
    assert(h.getAs[Long]("n_added") == 0 && h.getAs[Long]("n_removed") == 0)

    // head: new name, full data; v0: old name
    val head = Snapshots.readVersion(spark, root)
    assert(head.columns.toSeq == Seq("k", "amount", "s"))
    assert(head.where(col("k") === 7).select("amount").as[Double].head() == 7.0)
    val v0 = Snapshots.readVersion(spark, root, 0)
    assert(v0.columns.toSeq == Seq("k", "v", "s"))
    assert(v0.where(col("k") === 7).select("v").as[Double].head() == 7.0)

    // appends arrive under the LOGICAL name; files get the physical one
    Snapshots.append(spark, root,
      Seq((101L, 101.0, "s101")).toDF("k", "amount", "s"))
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 101).select("amount").as[Double].head() == 101.0)
    // and the pre-rename rows still read through the same head schema
    assert(Snapshots.readVersion(spark, root).agg(sum("amount")).as[Double].head()
      == (1L to 101L).map(_.toDouble).sum)

    // merge + predicate update on the renamed column
    Snapshots.mergeCow(spark, root,
      Seq((1L, 1000.0, "upd")).toDF("k", "amount", "s"), Seq("k"))
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 1).select("amount").as[Double].head() == 1000.0)
    Snapshots.updateWhere(spark, root, Map("amount" -> "amount + 1"), "k = 2")
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 2).select("amount").as[Double].head() == 3.0)

    // stats candidate selection translates logical -> physical: a
    // k-range predicate still prunes to one of the two clustered files
    val cands = Snapshots.statsCandidateFiles(
      spark, root, 0, "k <= 10")
    assert(cands.size == 1, s"clustered pruning survives the rename: $cands")

    // a WIDENABLE batch type (int into the double column) up-casts on
    // ingest under the new name (r11 type-widening behavior) …
    Snapshots.append(spark, root, Seq((200L, 1, "x")).toDF("k", "amount", "s"))
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 200).select("amount").as[Double].head() == 1.0)
    // … while a cross-family change is still refused under the new name
    intercept[IllegalArgumentException](Snapshots.append(spark, root,
      Seq((201L, "oops", "x")).toDF("k", "amount", "s")))
  }

  test("front door and streaming tail read renamed columns with pushdown intact") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    Snapshots.renameColumn(spark, root, "v", "amount")
    val front = spark.read.format("graft.sources.SnapshotSource").load(root)
    assert(front.columns.toSeq == Seq("k", "amount"))
    assert(front.where(col("amount") === 7.0).select("k").as[Long].head() == 7L)
    assert(front.where(col("k").between(10, 19)).agg(sum("amount")).as[Double].head()
      == (10L to 19L).map(_.toDouble).sum)
    // batch tail after the rename carries the logical name too
    Snapshots.append(spark, root, Seq((101L, 101.0)).toDF("k", "amount"))
    val (batch, _) = TableSync.appendsBetween(spark, root, 1, 2)
    assert(batch.columns.toSeq == Seq("k", "amount"))
    assert(batch.as[(Long, Double)].collect().toSeq == Seq((101L, 101.0)))
  }

  test("drop retires the physical name; a reborn column never resurrects old bytes") {
    val root = tmp()
    Snapshots.init(spark, root,
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "secret", "s"))
    val v1 = Snapshots.dropColumn(spark, root, "secret")
    assert(Snapshots.readVersion(spark, root).columns.toSeq == Seq("k", "s"))
    // history intact: the pre-drop version still reads the column
    assert(Snapshots.readVersion(spark, root, 0)
      .where(col("k") === 1).select("secret").as[Double].head() == 10.0)
    // zero data movement
    val h = Snapshots.history(spark, root).where(col("version") === v1).head()
    assert(h.getAs[Long]("n_added") == 0 && h.getAs[Long]("n_removed") == 0)

    // re-add a column with the SAME logical name: fresh physical name,
    // old files' bytes must NOT come back
    Snapshots.append(spark, root,
      Seq((3L, "c", 99.0)).toDF("k", "s", "secret"))
    val reborn = Snapshots.readVersion(spark, root)
      .orderBy("k").select("k", "secret").as[(Long, Option[Double])].collect().toSeq
    assert(reborn == Seq((1L, None), (2L, None), (3L, Some(99.0))),
      s"old 'secret' bytes must stay dead: $reborn")

    // dropping a partition column is refused
    val root2 = tmp()
    Snapshots.init(spark, root2, Seq((1L, 2024, "a")).toDF("k", "year", "s"),
      Map("graft.partitionBy" -> "year"))
    intercept[IllegalArgumentException](Snapshots.dropColumn(spark, root2, "year"))
    intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, root2, "year", "yr"))
  }

  test("rename on a partitioned table: data column renames work, CDC and compaction follow") {
    val root = tmp()
    Snapshots.init(spark, root,
      Seq((1L, 2024, 10.0), (2L, 2025, 20.0)).toDF("k", "year", "v"),
      Map("graft.partitionBy" -> "year"))
    Snapshots.renameColumn(spark, root, "v", "amount")
    val head = Snapshots.readVersion(spark, root)
    assert(head.columns.toSeq == Seq("k", "year", "amount"))
    assert(head.orderBy("k").as[(Long, Int, Double)].collect().toSeq
      == Seq((1L, 2024, 10.0), (2L, 2025, 20.0)))
    Snapshots.append(spark, root, Seq((3L, 2025, 30.0)).toDF("k", "year", "amount"))
    // CDC insert synthesis reads the renamed column correctly
    val feed = Snapshots.changesBetween(spark, root, 1, 2)
    assert(feed.select("k", "amount").as[(Long, Double)].collect().toSeq
      == Seq((3L, 30.0)))
    // compaction preserves both mapping and partition values
    val v = Snapshots.optimizeCompact(spark, root, smallerThanBytes = 10L * 1024 * 1024)
    assert(v > 0)
    assert(Snapshots.readVersion(spark, root).orderBy("k")
      .as[(Long, Int, Double)].collect().toSeq
      == Seq((1L, 2024, 10.0), (2L, 2025, 20.0), (3L, 2025, 30.0)))
  }
}
