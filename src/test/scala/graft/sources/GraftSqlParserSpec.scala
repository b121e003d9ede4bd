package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** The injected maintenance parser: OPTIMIZE / VACUUM as plain
  * spark.sql statements, everything else delegated untouched. */
class GraftSqlParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("gsp").toFile.getAbsolutePath + "/t"

  test("OPTIMIZE bin-packs small files and returns the committed version") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 400L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(8))
    assert(Snapshots.versionFiles(spark, root).size == 8)
    val v = spark.sql(s"OPTIMIZE graft.`$root`").as[Long].head()
    assert(v == 1L)
    assert(Snapshots.versionFiles(spark, root).size == 1,
      "eight small files pack into one")
    assert(Snapshots.readVersion(spark, root).count() == 400)
    // nothing left to pack: -1, no new commit
    assert(spark.sql(s"OPTIMIZE graft.`$root`").as[Long].head() == -1L)
  }

  test("OPTIMIZE WHERE scopes to matching partitions; ZORDER BY re-clusters") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, (i % 2).toInt, i * 1.0)).toDF("k", "par", "v")
        .repartition(6),
      Map("graft.partitionBy" -> "par"))
    val before = Snapshots.versionFiles(spark, root).toSet
    spark.sql(s"OPTIMIZE graft.`$root` WHERE par = 0")
    val after = Snapshots.versionFiles(spark, root).toSet
    assert(before.filter(_.contains("par=1")).subsetOf(after),
      "par=1 files carried untouched")
    assert(after.count(_.contains("par=0")) == 1, "par=0 compacted to one file")

    val zroot = tmp()
    Snapshots.init(spark, zroot,
      (0L until 256L).map(i => (i % 16, i / 16, i * 1.0)).toDF("a", "b", "v")
        .repartition(4))
    val zv = spark.sql(s"OPTIMIZE graft.`$zroot` ZORDER BY (a, b)").as[Long].head()
    assert(zv == 1L)
    assert(Snapshots.readVersion(spark, zroot).count() == 256)
  }

  test("VACUUM honors retention; a young table vacuums nothing") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.overwrite(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    // default 7-day retention: everything is younger — zero deletions
    assert(spark.sql(s"VACUUM graft.`$root`").as[Long].head() == 0L)
    assert(Snapshots.readVersion(spark, root, 0).count() == 100,
      "v0 still readable inside the retention window")
    // sub-default retention is refused unless explicitly overridden
    // (deleting inside the window breaks pinned snapshots/time travel)
    val guard = intercept[Exception](spark.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS"))
    assert(guard.getMessage.contains("retentionCheck"))
    // RETAIN 0 HOURS under the override: only the head's files survive
    spark.conf.set("spark.graft.vacuum.retentionCheck.enabled", "false")
    try assert(spark.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS").as[Long].head() > 0L)
    finally spark.conf.unset("spark.graft.vacuum.retentionCheck.enabled")
    assert(Snapshots.readVersion(spark, root).count() == 1)
    // everything else still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS x").as[Long].head() == 2L)
    // malformed maintenance statements fail loudly
    intercept[Exception](spark.sql(s"VACUUM graft.`$root` RETAIN soon"))
  }

  test("RESTORE TO VERSION/TIMESTAMP AS OF and DESCRIBE HISTORY as SQL") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.overwrite(spark, root, Seq((99L, 9.0)).toDF("k", "v"))
    val v = spark.sql(s"RESTORE TABLE graft.`$root` TO VERSION AS OF 0")
      .as[Long].head()
    assert(v == 2L, "restore is a NEW commit")
    assert(Snapshots.readVersion(spark, root).count() == 50)
    // timestamp spelling restores to the version live at that moment
    val tsV1 = Snapshots.commitTimestamp(spark, root, 1L)
    spark.sql(s"RESTORE graft.`$root` TO TIMESTAMP AS OF $tsV1")
    assert(Snapshots.readVersion(spark, root).count() == 1)

    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$root`")
    assert(hist.columns.take(3).toSeq == Seq("version", "commit_ts_ms", "op"))
    assert(hist.select("version").as[Long].collect().toSeq == Seq(3L, 2L, 1L, 0L),
      "newest first, all four commits")
    assert(hist.select("op").as[String].collect().take(2).forall(_ == "restore"))
    // plain DESCRIBE TABLE still delegates to Spark
    assert(spark.sql(s"DESCRIBE TABLE graft.`$root`").count() > 0)
  }

  test("DESCRIBE DETAIL reports the log's physical summary in one row") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 200L).map(i => (i, i % 4, i * 1.0)).toDF("k", "p", "v").repartition(3),
      Map("graft.partitionBy" -> "p"))
    val d = spark.sql(s"DESCRIBE DETAIL graft.`$root`").head()
    assert(d.getString(0) == "graft")
    assert(d.getString(1) == root)
    assert(d.getLong(2) == 0L) // head version
    assert(d.getLong(3) > 0L) // commit ts
    assert(d.getString(4) == "p")
    val files = Snapshots.versionFiles(spark, root)
    assert(d.getLong(6) == files.size.toLong)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val size = files.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    assert(d.getLong(7) == size)
    assert(d.getLong(8) == 200L, "numRows answered from the log, no data scan")
    assert(d.getString(9).contains("graft.partitionBy"))
    // a MOR-deleted table cannot answer numRows from envelopes — null
    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    val d2 = spark.sql(s"DESCRIBE DETAIL graft.`$root`").head()
    assert(d2.isNullAt(8))
  }

  test("VACUUM DRY RUN previews exactly what the real vacuum deletes, touching nothing") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.overwrite(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    // the retention guard applies to the preview too
    val guard = intercept[Exception](
      spark.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS DRY RUN"))
    assert(guard.getMessage.contains("retentionCheck"))
    spark.conf.set("spark.graft.vacuum.retentionCheck.enabled", "false")
    try {
      val planned =
        spark.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS DRY RUN")
          .as[String].collect().toSeq
      assert(planned.nonEmpty, "v0's orphaned files are candidates")
      // ZERO side effects: full history still reconstructs
      assert(Snapshots.versions(spark, root) == Seq(0L, 1L))
      assert(Snapshots.readVersion(spark, root, 0).count() == 100,
        "dry run deleted nothing")
      // the real vacuum deletes exactly the previewed count
      val deleted = spark.sql(s"VACUUM graft.`$root` RETAIN 0 HOURS").as[Long].head()
      assert(deleted == planned.size.toLong)
      // inside the default window the preview is empty
      assert(spark.sql(s"VACUUM graft.`$root` DRY RUN").count() == 0L)
    } finally spark.conf.unset("spark.graft.vacuum.retentionCheck.enabled")
  }

  test("REORG TABLE APPLY (PURGE) folds deletion vectors into a rewrite") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    // MOR left vectors live; PURGE rewrites them away as one commit
    val v = spark.sql(s"REORG TABLE graft.`$root` APPLY (PURGE)").as[Long].head()
    assert(v == 2L)
    assert(Snapshots.readVersion(spark, root).count() == 90)
    // a vector-free table purges as a no-op (-1, no commit)
    assert(spark.sql(s"REORG TABLE graft.`$root` APPLY (PURGE)").as[Long].head() == -1L)
    intercept[Exception](spark.sql(s"REORG TABLE graft.`$root` APPLY (VACUUM)"))
  }

  test("ALTER TABLE ... DROP FEATURE as SQL: statement shape + downgrade") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    Snapshots.materializeDeletionVectors(spark, root)
    val v = spark.sql(s"ALTER TABLE graft.`$root` DROP FEATURE deletionVectors")
      .as[Long].head()
    assert(v == Snapshots.latestVersion(spark, root))
    assert(!Snapshots.protocol(spark, root)._3.contains("deletionVectors"))
    assert(Snapshots.readVersion(spark, root).count() == 90)
    // backtick-quoted feature name parses too
    intercept[IllegalArgumentException](
      spark.sql(s"ALTER TABLE graft.`$root` DROP FEATURE `deletionVectors`"))
    // (refuses because it's already dropped — the shape parsed)
    // a non-snapshot table falls through to Spark's ALTER (which has no
    // DROP FEATURE) — never silently swallowed
    intercept[Exception](spark.sql("ALTER TABLE not_a_table DROP FEATURE x"))
  }

  test("CREATE TABLE ... SHALLOW CLONE as SQL, version-pinned, IF NOT EXISTS no-op") {
    val src = tmp()
    Snapshots.init(spark, src, (1L to 60L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.append(spark, src, Seq((999L, 9.0)).toDF("k", "v"))
    val dst = tmp()
    val v = spark.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`")
      .as[Long].head()
    assert(v == 0L, "the clone starts its own history at v0")
    assert(Snapshots.readVersion(spark, dst).count() == 61, "head-version clone")
    // pinned to an earlier source version
    val dst0 = tmp()
    spark.sql(s"CREATE TABLE graft.`$dst0` SHALLOW CLONE graft.`$src` VERSION AS OF 0")
    assert(Snapshots.readVersion(spark, dst0).count() == 60)
    // timestamp spelling pins the version live at that moment
    val dstTs = tmp()
    val ts0 = Snapshots.commitTimestamp(spark, src, 0L)
    spark.sql(
      s"CREATE TABLE graft.`$dstTs` SHALLOW CLONE graft.`$src` TIMESTAMP AS OF $ts0")
    assert(Snapshots.readVersion(spark, dstTs).count() == 60)
    // an initialised target refuses without IF NOT EXISTS, no-ops with it
    intercept[Exception](
      spark.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`"))
    assert(spark.sql(
      s"CREATE TABLE IF NOT EXISTS graft.`$dst` SHALLOW CLONE graft.`$src`")
      .as[Long].head() == 0L)
    assert(Snapshots.readVersion(spark, dst).count() == 61, "no-op kept the clone")
    // plain CREATE TABLE still delegates to Spark's own parser
    spark.sql("CREATE TABLE gsp_plain_create (k INT) USING parquet")
    try assert(spark.sql("SELECT * FROM gsp_plain_create").count() == 0L)
    finally spark.sql("DROP TABLE gsp_plain_create")
  }

  test("maintenance on an unresolved table names the real problem, not a syntax error") {
    // VACUUM/OPTIMIZE/... on a typo'd or unregistered table falls
    // through to Spark's parser, which has no such statement — the raw
    // PARSE_SYNTAX_ERROR buried the actual cause. The rethrow must lead
    // with the resolution failure.
    // (DESCRIBE HISTORY/DETAIL are absent: Spark parses those as
    // DescribeColumn, so they fail at ANALYSIS with the table name in
    // the message already — only parse-level statements need the rethrow)
    Seq("VACUUM not_registered_tbl",
      "OPTIMIZE not_registered_tbl",
      "RESTORE not_registered_tbl TO VERSION AS OF 0",
      "REORG TABLE not_registered_tbl APPLY (PURGE)").foreach { stmt =>
      val e = intercept[Exception](spark.sql(stmt))
      assert(e.getMessage.contains("not a registered snapshot table"),
        s"'$stmt' gave: ${e.getMessage.take(200)}")
      assert(e.getMessage.contains("graft.`/path`"),
        "the error tells the operator the two ways to address a table")
    }
    // a genuinely malformed statement on a REGISTERED name still
    // surfaces the statement-shape error, not the resolution rethrow
    val root = tmp()
    Snapshots.init(spark, root, Seq((1, 1.0)).toDF("k", "v"))
    val e2 = intercept[Exception](
      spark.sql(s"OPTIMIZE graft.`$root` WHERE k > 0 REBUCKET 4 ZORDER"))
    assert(!e2.getMessage.contains("not a registered snapshot table"),
      e2.getMessage.take(200))
  }
}
