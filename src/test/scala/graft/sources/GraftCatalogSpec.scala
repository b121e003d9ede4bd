package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** DSv2 TableCatalog front door (`spark.sql.catalog.graft`): pure-SQL
  * reads with time travel, INSERT INTO/OVERWRITE (full, static
  * partition, dynamic), CREATE TABLE / CTAS, SHOW PARTITIONS, DESCRIBE
  * — all without a temp view or registration call, with reads planning
  * the SAME native SnapshotFileIndex scan as the other front doors. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("cat").toFile.getAbsolutePath + "/t"

  private def finalPlanOf(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => fileScans(qs.plan)
      case _ => Nil
    }

  test("SELECT over graft.`/path` plans the native SnapshotFileIndex scan; VERSION/TIMESTAMP AS OF time travel") {
    val root = tmp()
    Snapshots.init(spark, root, (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.append(spark, root, Seq((101L, 101.0)).toDF("k", "v"))

    val q = spark.sql(s"SELECT k FROM graft.`$root` WHERE k >= 50")
    assert(q.as[Long].collect().sorted.toSeq == (50L to 101L))
    val scans = fileScans(finalPlanOf(q))
    assert(scans.exists(_.metadata("Location").contains("SnapshotFileIndex")),
      s"catalog read must plan the log's own FileIndex:\n${finalPlanOf(q)}")
    assert(scans.head.metadata("PushedFilters").contains("GreaterThanOrEqual(k,50)"),
      "predicates push to the parquet scan through the catalog door")

    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$root` VERSION AS OF 0")
      .as[Long].head() == 100L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$root` VERSION AS OF 1")
      .as[Long].head() == 101L)
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$root` TIMESTAMP AS OF '2030-01-01 00:00:00'")
      .as[Long].head() == 101L, "a future timestamp resolves to the head")
  }

  test("INSERT INTO / OVERWRITE / static-partition / dynamic-partition route to the log's commits") {
    val root = tmp()
    Snapshots.init(spark, root,
      Seq((1L, 2024, "a"), (2L, 2024, "b"), (3L, 2025, "c")).toDF("k", "year", "s"),
      Map("graft.partitionBy" -> "year"))

    // append (note file-source column order: data cols first, partition last)
    spark.sql(s"INSERT INTO graft.`$root` SELECT 4L, 'd', 2025")
    assert(Snapshots.readVersion(spark, root).count() == 4)
    assert(Snapshots.latestVersion(spark, root) == 1L)

    // static partition spec → replaceWhere (only that partition rewritten)
    spark.sql(s"INSERT OVERWRITE graft.`$root` PARTITION (year=2024) SELECT 10L, 'x'")
    assert(Snapshots.readVersion(spark, root).orderBy("k")
      .select("k", "year").as[(Long, Int)].collect().toSeq
      == Seq((3L, 2025), (4L, 2025), (10L, 2024)),
      "2024 replaced, 2025 untouched")
    val removed = Snapshots.versionFiles(spark, root, 1).toSet
      .diff(Snapshots.versionFiles(spark, root, 2).toSet)
    assert(removed.nonEmpty && removed.forall(_.contains("year=2024")),
      s"static overwrite removes only the named partition: $removed")

    // dynamic partition overwrite (session partitionOverwriteMode=dynamic):
    // replaces exactly the partitions present in the query result
    spark.sql(s"INSERT OVERWRITE graft.`$root` SELECT 20L, 'y', 2025")
    assert(Snapshots.readVersion(spark, root).orderBy("k")
      .select("k", "year").as[(Long, Int)].collect().toSeq
      == Seq((10L, 2024), (20L, 2025)),
      "2025 replaced by the batch, 2024 carried")

    // full overwrite on an unpartitioned table
    val flat = tmp()
    Snapshots.init(spark, flat, Seq((1L, "a")).toDF("k", "s"))
    spark.sql(s"INSERT OVERWRITE graft.`$flat` SELECT 9L, 'z'")
    assert(Snapshots.readVersion(spark, flat).as[(Long, String)].collect().toSeq
      == Seq((9L, "z")))
  }

  test("CREATE TABLE / CTAS / SHOW PARTITIONS / DESCRIBE under a warehouse") {
    val wh = Files.createTempDirectory("cwh").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    // the catalog instance may already be cached with its old options;
    // re-registering the conf requires a fresh catalog name
    spark.conf.set("spark.sql.catalog.graftwh", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftwh.warehouse", wh)

    spark.sql(
      "CREATE TABLE graftwh.events (k BIGINT, v DOUBLE, year INT) PARTITIONED BY (year)")
    assert(Snapshots.versions(spark, s"$wh/events").nonEmpty, "log created under warehouse")
    spark.sql("INSERT INTO graftwh.events SELECT 1L, 1.0, 2024")
    spark.sql("INSERT INTO graftwh.events SELECT 2L, 2.0, 2025")
    assert(spark.sql("SELECT k FROM graftwh.events ORDER BY k").as[Long].collect().toSeq
      == Seq(1L, 2L), "named table resolves through the warehouse")

    val parts = spark.sql("SHOW PARTITIONS graftwh.events")
      .as[String].collect().sorted.toSeq
    assert(parts == Seq("year=2024", "year=2025"), s"got: $parts")

    val desc = spark.sql("DESCRIBE TABLE graftwh.events").collect().map(_.getString(0))
    assert(desc.contains("k") && desc.contains("year"))

    spark.sql("CREATE TABLE graftwh.copy AS SELECT k, v FROM graftwh.events")
    assert(spark.sql("SELECT COUNT(*) FROM graftwh.copy").as[Long].head() == 2L)

    assert(spark.sql("SHOW TABLES IN graftwh").collect().map(_.getString(1)).toSet
      == Set("events", "copy"))
  }

  test("catalog reads apply deletion vectors and prune partitions") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i * 1.0))
        .toDF("k", "par", "v"),
      Map("graft.partitionBy" -> "par"))
    Snapshots.deleteWhereMor(spark, root, "k <= 10")
    val q = spark.sql(s"SELECT k FROM graft.`$root` WHERE par = 'even'")
    assert(q.as[Long].collect().sorted.toSeq == (12L to 100L by 2L),
      "partition filter + deletion vector both applied")
    val scan = fileScans(finalPlanOf(q))
      .find(_.metadata("Location").contains("SnapshotFileIndex")).get
    assert(scan.metadata("PartitionFilters").contains("par"),
      s"catalog reads keep Catalyst partition pruning: ${scan.metadata("PartitionFilters")}")
  }
}
