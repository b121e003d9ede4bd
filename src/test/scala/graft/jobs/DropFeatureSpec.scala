package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ALTER TABLE … DROP FEATURE` — the protocol DOWNGRADE that un-sticks
  * the feature gating: deletionVectors drops after materialization,
  * rowTracking drops by retiring `_row_id` through column mapping, the
  * drop checkpoints off-cycle so head reads never touch a pre-drop
  * delta, and `vacuum` is the TRUNCATE HISTORY step after which NO
  * surviving log object carries the mark. Preconditions refuse loudly;
  * content that would resurrect a dropped feature refuses in
  * `writeDelta` itself. */
class DropFeatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("dropfeat").toFile.getAbsolutePath + "/t"

  private def feats(root: String): (Seq[String], Seq[String]) = {
    val p = Snapshots.protocol(spark, root)
    (p._3, p._4)
  }

  test("deletionVectors: two-step drop, then vacuum truncates the marks away") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(2))
    Snapshots.deleteWhereMor(spark, root, "k % 10 = 0")
    assert(feats(root)._1.contains("deletionVectors"))
    // step 0 refused: a live vector still depends on the feature
    val e = intercept[IllegalArgumentException](
      Snapshots.dropFeature(spark, root, "deletionVectors"))
    assert(e.getMessage.contains("materializeDeletionVectors"))
    // step 1: materialize; step 2: drop
    Snapshots.materializeDeletionVectors(spark, root)
    val dropV = spark.sql(
      s"ALTER TABLE graft.`$root` DROP FEATURE deletionVectors")
      .head().getLong(0)
    val (r, w) = feats(root)
    assert(!r.contains("deletionVectors") && !w.contains("deletionVectors"),
      s"feature must leave both lists: $r / $w")
    // content identical through the drop
    assert(Snapshots.readVersion(spark, root).count() == 90)
    assert(spark.read.format("graft.sources.SnapshotSource").load(root)
      .agg(sum("k")).head().getLong(0) ==
      (1L to 100L).filter(_ % 10 != 0).sum)
    // the drop checkpointed off-cycle, so head planning reads NO pre-drop
    // delta; old versions still gate (they genuinely used DVs)
    assert((0L until dropV).exists(v =>
      Snapshots.protocol(spark, root, v)._3.contains("deletionVectors")))
    // TRUNCATE HISTORY: after vacuum to the drop version, NO surviving
    // log version carries the mark — a minimal reader accepts the table
    Snapshots.vacuum(spark, root, dropV)
    val surviving = Snapshots.versions(spark, root)
    assert(surviving.min == dropV)
    assert(surviving.forall { v =>
      val p = Snapshots.protocol(spark, root, v)
      !p._3.contains("deletionVectors") && !p._4.contains("deletionVectors")
    }, "no surviving delta may demand the dropped feature")
    // a LATER MOR delete re-acquires the feature (drop is not a ban)
    Snapshots.deleteWhereMor(spark, root, "k = 1")
    assert(feats(root)._1.contains("deletionVectors"))
  }

  test("rowTracking: drops _row_id via column mapping in ONE commit") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map("graft.rowTracking" -> "true"))
    Snapshots.append(spark, root, Seq((51L, 51.0)).toDF("k", "v"))
    assert(feats(root)._2.contains("rowTracking"))
    assert(spark.read.format("graft.sources.SnapshotSource")
      .option("rowIds", "true").load(root).columns.contains("_row_id"))
    val before = Snapshots.readVersion(spark, root)
      .agg(count(lit(1)), sum("k")).head()
    spark.sql(s"ALTER TABLE graft.`$root` DROP FEATURE rowTracking")
    val (r2, w2) = feats(root)
    assert(!w2.contains("rowTracking"))
    // the hidden column is gone from EVERY surface, including rowIds
    assert(!Snapshots.readVersion(spark, root).columns.contains("_row_id"))
    assert(!spark.read.format("graft.sources.SnapshotSource")
      .option("rowIds", "true").load(root).columns.contains("_row_id"))
    // engine props removed; the retirement rode column mapping
    val props = Snapshots.tableProperties(spark, root)
    assert(!props.contains("graft.rowTracking") &&
      !props.keys.exists(_.startsWith("graft.identity._row_id")))
    assert(r2.contains("columnMapping"),
      "retiring the physical name is exactly a column-mapping commit")
    assert(Snapshots.readVersion(spark, root)
      .agg(count(lit(1)), sum("k")).head() == before)
    // appends keep working and draw no ids
    Snapshots.append(spark, root, Seq((52L, 52.0)).toDF("k", "v"))
    assert(Snapshots.readVersion(spark, root).count() == 52)
  }

  test("writer-only features drop when props no longer demand them; guards hold") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 10L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.addCheckConstraint(spark, root, "k_pos", "k > 0")
    assert(feats(root)._2.contains("checkConstraints"))
    // still demanded → writeDelta's resurrect guard refuses
    intercept[IllegalArgumentException](
      Snapshots.dropFeature(spark, root, "checkConstraints"))
    Snapshots.dropCheckConstraint(spark, root, "k_pos")
    Snapshots.dropFeature(spark, root, "checkConstraints")
    assert(!feats(root)._2.contains("checkConstraints"))
    // absent feature refuses
    intercept[IllegalArgumentException](
      Snapshots.dropFeature(spark, root, "checkConstraints"))
    // reader features old files permanently need refuse
    Snapshots.renameColumn(spark, root, "v", "val")
    intercept[UnsupportedOperationException](
      Snapshots.dropFeature(spark, root, "columnMapping"))
  }

  test("parquetCheckpoint drops after flipping the format back to text") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 40L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map(Snapshots.checkpointFormatProp -> "parquet"))
    (1 to 11).foreach(b => Snapshots.append(spark, root,
      Seq((100L + b, 1.0)).toDF("k", "v")))
    assert(feats(root)._1.contains("parquetCheckpoint"))
    intercept[IllegalArgumentException](
      Snapshots.dropFeature(spark, root, "parquetCheckpoint"))
    Snapshots.setProperties(spark, root,
      Map(Snapshots.checkpointFormatProp -> "text"))
    val dropV = Snapshots.dropFeature(spark, root, "parquetCheckpoint")
    assert(!feats(root)._1.contains("parquetCheckpoint"))
    // the drop's own off-cycle checkpoint landed in the TEXT codec
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      root + f"/_log/v$dropV%08d.checkpoint")))
    assert(Snapshots.readVersion(spark, root).count() == 51)
  }
}
