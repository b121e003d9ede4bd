package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Write-time clustering (`graft.clusterBy` table property) and shallow
  * CLONE (zero-copy table fork). */
class CloneAndClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cc").toFile.getAbsolutePath + "/t"

  test("clusterBy property: every commit's stats envelopes prune without any OPTIMIZE") {
    val root = tmp()
    // deliberately SHUFFLED input across 3 partitions — without
    // clustering each file's [min,max] would span the whole key domain
    val shuffled = (1L to 300L).map(i => ((i * 131) % 301, i * 1.0))
      .toDF("k", "v").repartition(3)
    Snapshots.init(spark, root, shuffled, Map("graft.clusterBy" -> "k"))
    val cands = Snapshots.statsCandidateFiles(spark, root, 0, "k <= 50")
    val all = Snapshots.versionFiles(spark, root, 0)
    assert(cands.size < all.size,
      s"write-time clustering must tighten envelopes: ${cands.size} of ${all.size} candidate")
    // appends cluster too
    Snapshots.append(spark, root,
      (301L to 600L).map(i => ((i * 131) % 301 + 1000, i * 1.0)).toDF("k", "v").repartition(3))
    val cands2 = Snapshots.statsCandidateFiles(spark, root, 1, "k <= 50")
    assert(cands2.size < Snapshots.versionFiles(spark, root, 1).size)
    // content exact
    assert(Snapshots.readVersion(spark, root).count() == 600)
    // control: without the property, a 3-partition shuffled init keeps
    // every file candidate
    val root2 = tmp()
    Snapshots.init(spark, root2, shuffled)
    assert(Snapshots.statsCandidateFiles(spark, root2, 0, "k <= 50").size == 3)
  }

  test("generated columns: computed on every ingest path, contradictions refused, derived partition keys prune") {
    val root = tmp()
    val props = Map(
      "graft.partitionBy" -> "bucket",
      "graft.generated.bucket" -> "CAST(k % 4 AS INT)")
    // writers ship RAW rows — the derived partition key materializes
    Snapshots.init(spark, root, (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"), props)
    assert(Snapshots.readVersion(spark, root).columns.toSeq == Seq("k", "v", "bucket"))
    assert(Snapshots.versionFiles(spark, root).forall(_.contains("bucket=")))
    // append + merge + streaming commit all generate
    Snapshots.append(spark, root, Seq((101L, 101.0)).toDF("k", "v"))
    Snapshots.mergeCow(spark, root, Seq((1L, -1.0)).toDF("k", "v"), Seq("k"))
    Snapshots.commitStreamingBatch(spark, root, Seq((102L, 102.0)).toDF("k", "v"), 7L)
    val head = Snapshots.readVersion(spark, root)
    assert(head.count() == 102)
    assert(head.where(col("k") === 101).select("bucket").as[Int].head() == 1)
    assert(head.where(col("k") === 1).select("v").as[Double].head() == -1.0)
    // Catalyst partition-prunes on the DERIVED key through the front door
    val front = spark.read.format("graft.sources.SnapshotSource").load(root)
    assert(front.where(col("bucket") === 2).select("k").as[Long].collect().toSet
      == (1L to 102L).filter(_ % 4 == 2).toSet)
    // an explicit CONTRADICTING value is refused before anything commits
    intercept[IllegalArgumentException](Snapshots.append(spark, root,
      Seq((200L, 2.0, 3)).toDF("k", "v", "bucket")))
    // an explicit CONSISTENT value is accepted
    Snapshots.append(spark, root, Seq((200L, 2.0, 0)).toDF("k", "v", "bucket"))
    assert(Snapshots.readVersion(spark, root).count() == 103)
    // an UPDATE that would leave the derived column stale is refused
    intercept[IllegalArgumentException](
      Snapshots.updateWhere(spark, root, Map("k" -> "k + 1"), "k = 5"))
    // an UPDATE that doesn't touch the generation source is fine
    Snapshots.updateWhere(spark, root, Map("v" -> "v * 2"), "k = 5")
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 5).select("v").as[Double].head() == 10.0)
  }

  test("shallow clone: zero data copied, divergence is isolated, source stays byte-intact") {
    val src = tmp(); val dst = tmp()
    Snapshots.init(spark, src,
      (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(2))
    Snapshots.append(spark, src, Seq((201L, 201.0)).toDF("k", "v"))
    def sigs(root: String): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet")).map { f =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
        f.getAbsolutePath -> md5
      }.toMap
    }
    val srcSigs = sigs(src)

    Snapshots.cloneShallow(spark, src, dst)
    // zero data under the clone's root
    assert(!new java.io.File(dst, "data").exists() ||
      new java.io.File(dst, "data").listFiles().isEmpty)
    // identical content, schema, and stats-backed planning
    assert(Snapshots.readVersion(spark, dst).orderBy("k").as[(Long, Double)].collect().toSeq
      == Snapshots.readVersion(spark, src).orderBy("k").as[(Long, Double)].collect().toSeq)
    assert(Snapshots.rowCount(spark, dst).contains(201L),
      "write-time stats carry over — COUNT(*) from the clone's log alone")

    // the clone diverges without touching the source
    Snapshots.mergeCow(spark, dst, Seq((1L, 1000.0)).toDF("k", "v"), Seq("k"))
    Snapshots.deleteKeysCow(spark, dst, Seq(2L).toDF("k"), Seq("k"))
    Snapshots.append(spark, dst, Seq((999L, 9.0)).toDF("k", "v"))
    assert(Snapshots.readVersion(spark, dst).count() == 201)
    assert(Snapshots.readVersion(spark, src).count() == 201)
    assert(Snapshots.readVersion(spark, src)
      .where(col("k") === 1).select("v").as[Double].head() == 1.0,
      "source row untouched by the clone's merge")
    assert(sigs(src) == srcSigs, "not one source byte changed")

    // the clone's vacuum must NEVER delete borrowed source files —
    // even after the clone de-referenced them all
    Snapshots.overwrite(spark, dst, Seq((1L, 1.0)).toDF("k", "v"))
    val headV = Snapshots.latestVersion(spark, dst)
    Snapshots.vacuum(spark, dst, keepFrom = headV)
    assert(sigs(src) == srcSigs, "vacuuming the clone left the source intact")
    assert(Snapshots.readVersion(spark, src).count() == 201)

    // front door works on a fresh clone too
    val dst2 = tmp()
    Snapshots.cloneShallow(spark, src, dst2)
    assert(spark.read.format("graft.sources.SnapshotSource").load(dst2).count() == 201)
    // cloning a DV-carrying table is refused until materialize
    Snapshots.deleteWhereMor(spark, src, "k <= 5")
    intercept[IllegalArgumentException](
      Snapshots.cloneShallow(spark, src, tmp()))
  }
}
