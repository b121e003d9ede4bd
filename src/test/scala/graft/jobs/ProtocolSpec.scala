package graft.jobs

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Protocol versioning + table features (Delta's minReader/minWriter +
  * tableFeatures shape): every commit stamps the accumulated feature
  * lists; readers refuse unknown READER features loudly (reading anyway
  * would return wrong data — DVs ignored, physical names misresolved),
  * writers refuse unknown WRITER features (committing anyway would
  * break identity/constraint/bucket invariants); legacy logs parse as
  * feature-none. */
class ProtocolSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("proto").toFile.getAbsolutePath + "/t"

  private def commitFile(root: String, v: Long) =
    new java.io.File(root, f"_log/v$v%08d.commit")

  private def rewriteLines(f: java.io.File, xf: Seq[String] => Seq[String]): Unit = {
    val lines = java.nio.file.Files.readAllLines(f.toPath).asScala.toSeq
    java.nio.file.Files.write(f.toPath,
      (xf(lines).mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("features accumulate stickily and surface through DESCRIBE DETAIL") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1 to 40).map(i => (i, i * 10)).toDF("k", "v"),
      Map("graft.identity.rid" -> "1,1", "graft.bucketBy" -> "k",
        "graft.buckets" -> "4"))
    val (_, _, r0, w0) = Snapshots.protocol(spark, root)
    assert(r0.isEmpty, s"plain data needs no reader features: $r0")
    assert(w0.toSet == Set("bucketing", "identityColumns"), w0.toString)
    // a DV delete adds deletionVectors to BOTH lists
    Snapshots.deleteWhereMor(spark, root, "k = 3")
    val (_, _, r1, w1) = Snapshots.protocol(spark, root)
    assert(r1 == Seq("deletionVectors"), r1.toString)
    assert(w1.toSet == Set("bucketing", "deletionVectors", "identityColumns"))
    // widening a (non-bucket) column adds typeWidening
    Snapshots.alterColumnType(spark, root, "v", LongType)
    val (_, _, r2, _) = Snapshots.protocol(spark, root)
    assert(r2.toSet == Set("deletionVectors", "typeWidening"), r2.toString)
    // STICKY: a plain append afterwards keeps carrying every mark
    Snapshots.append(spark, root, Seq((100, 1000L)).toDF("k", "v"))
    val (minR, minW, r3, w3) = Snapshots.protocol(spark, root)
    assert(minR == 1 && minW == 1)
    assert(r3.toSet == Set("deletionVectors", "typeWidening"))
    assert(w3.toSet == Set("bucketing", "deletionVectors", "identityColumns",
      "typeWidening"))
    // DESCRIBE DETAIL surfaces the protocol
    val det = spark.sql(s"DESCRIBE DETAIL graft.`$root`").head()
    assert(det.getAs[Int]("min_reader_version") == 1)
    assert(det.getAs[Int]("min_writer_version") == 1)
    assert(det.getAs[String]("reader_features")
      == "deletionVectors,typeWidening")
    assert(det.getAs[String]("writer_features")
      == "bucketing,deletionVectors,identityColumns,typeWidening")
  }

  test("a legacy log with no protocol headers reads as feature-none") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1, 1.0), (2, 2.0)).toDF("k", "v"))
    Snapshots.append(spark, root, Seq((3, 3.0)).toDF("k", "v"))
    (0L to 1L).foreach { v =>
      rewriteLines(commitFile(root, v), _.filterNot(l =>
        l.startsWith("#protocol:") || l.startsWith("#rfeat:") ||
          l.startsWith("#wfeat:")))
    }
    Snapshots.invalidateCaches(spark, root)
    assert(Snapshots.protocol(spark, root) == ((1, 1, Nil, Nil)))
    assert(Snapshots.readVersion(spark, root).count() == 3L)
    // and a NEW commit on the legacy log starts stamping again
    Snapshots.append(spark, root, Seq((4, 4.0)).toDF("k", "v"))
    val lines = java.nio.file.Files
      .readAllLines(commitFile(root, 2L).toPath).asScala
    assert(lines.exists(_.startsWith("#protocol:1,1")), lines.toString)
  }

  test("an unknown READER feature refuses loudly on read AND on DML") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1, 1.0)).toDF("k", "v"))
    rewriteLines(commitFile(root, 0L), _ :+ "#rfeat:futureCompression")
    Snapshots.invalidateCaches(spark, root)
    val e = intercept[IllegalStateException](
      Snapshots.readVersion(spark, root).count())
    assert(e.getMessage.contains("futureCompression") &&
      e.getMessage.contains("reader"), e.getMessage)
    // the writer must read the predecessor first, so DML refuses too
    val e2 = intercept[IllegalStateException](
      Snapshots.append(spark, root, Seq((2, 2.0)).toDF("k", "v")))
    assert(e2.getMessage.contains("futureCompression"), e2.getMessage)
    // history / DESCRIBE DETAIL refuse rather than show half-truths
    intercept[IllegalStateException](Snapshots.history(spark, root).collect())
  }

  test("an unknown WRITER feature keeps reads working but refuses DML") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1, 1.0), (2, 2.0)).toDF("k", "v"))
    rewriteLines(commitFile(root, 0L), _ :+ "#wfeat:futureRowTracking")
    Snapshots.invalidateCaches(spark, root)
    // reads are safe: writer features don't change byte interpretation
    assert(Snapshots.readVersion(spark, root).count() == 2L)
    val e = intercept[IllegalStateException](
      Snapshots.append(spark, root, Seq((3, 3.0)).toDF("k", "v")))
    assert(e.getMessage.contains("futureRowTracking") &&
      e.getMessage.contains("writer"), e.getMessage)
    assert(Snapshots.latestVersion(spark, root) == 0L, "no commit landed")
    val e2 = intercept[IllegalStateException](
      Snapshots.deleteWhere(spark, root, "k = 1"))
    assert(e2.getMessage.contains("futureRowTracking"), e2.getMessage)
  }

  test("a higher minReader/minWriter than this build refuses") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1, 1.0)).toDF("k", "v"))
    rewriteLines(commitFile(root, 0L),
      _.map(l => if (l.startsWith("#protocol:")) "#protocol:99,99" else l))
    Snapshots.invalidateCaches(spark, root)
    val e = intercept[IllegalStateException](
      Snapshots.readVersion(spark, root).count())
    assert(e.getMessage.contains("99"), e.getMessage)
  }

  test("the checkpoint carries the protocol headers") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1, 1.0)).toDF("k", "v"),
      Map("graft.identity.rid" -> "1,1"))
    (1 to 10).foreach(i =>
      Snapshots.append(spark, root, Seq((i * 10, i * 1.0)).toDF("k", "v")))
    val ckpt = new java.io.File(root, "_log/v00000010.checkpoint")
    assert(ckpt.exists)
    val lines = java.nio.file.Files.readAllLines(ckpt.toPath).asScala
    assert(lines.exists(_.startsWith("#protocol:1,1")), lines.take(5).toString)
    assert(lines.contains("#wfeat:identityColumns"), lines.take(8).toString)
  }

  test("parquet-checkpoint tables stamp the _headers split gate (checkpointHeadersDir)") {
    val root = tmp()
    // the r17 `_headers/` side-directory is INVISIBLE to Spark's parquet
    // reader — a build that knows parquetCheckpoint but not the split
    // would read a split manifest's main directory as the whole table
    // (silent data loss), so the gate must stamp the moment the codec
    // can ever write one: with parquetCheckpoint itself
    Snapshots.init(spark, root, Seq((1, 1.0)).toDF("k", "v"),
      Map(Snapshots.checkpointFormatProp -> "parquet"))
    val (_, _, r, w) = Snapshots.protocol(spark, root)
    assert(r.contains("parquetCheckpoint") && r.contains("checkpointHeadersDir"),
      s"reader features must gate the split layout: $r")
    assert(w.contains("checkpointHeadersDir"), s"writer features: $w")
    // droppable exactly like parquetCheckpoint: only once the codec is text
    val e = intercept[IllegalArgumentException](
      Snapshots.dropFeature(spark, root, "checkpointHeadersDir"))
    assert(e.getMessage.contains("text"), e.getMessage)
    Snapshots.setProperties(spark, root,
      Map(Snapshots.checkpointFormatProp -> "text"))
    Snapshots.dropFeature(spark, root, "checkpointHeadersDir")
    assert(!Snapshots.protocol(spark, root)._3.contains("checkpointHeadersDir"))
  }
}
