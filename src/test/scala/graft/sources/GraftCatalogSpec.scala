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

    // reader-option spelling (Delta parity) — Spark's TimeTravelSpec
    // routes these into the catalog's loadTable overloads
    assert(spark.read.option("versionAsOf", 0).table(s"graft.`$root`").count() == 100L)
    val ts0 = new java.sql.Timestamp(
      Snapshots.commitTimestamp(spark, root, 0L)).toString
    assert(spark.read.option("timestampAsOf", ts0)
      .table(s"graft.`$root`").count() == 100L)
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

  test("SQL DELETE / UPDATE / MERGE through the catalog door hit the log's DML commits") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 300L).map(i => (i, i * 1.0, s"s$i")).toDF("k", "v", "s")
        .repartitionByRange(3, col("k")).sortWithinPartitions("k"))

    spark.sql(s"DELETE FROM graft.`$root` WHERE k <= 50")
    assert(Snapshots.readVersion(spark, root).count() == 250)
    assert(Snapshots.latestVersion(spark, root) == 1L)

    spark.sql(s"UPDATE graft.`$root` SET v = v * 10 WHERE k BETWEEN 101 AND 110")
    val head = Snapshots.readVersion(spark, root)
    assert(head.where(col("k") === 105).select("v").as[Double].head() == 1050.0)
    assert(head.where(col("k") === 111).select("v").as[Double].head() == 111.0)

    // whole-row upsert MERGE from an inline VALUES source
    spark.sql(
      s"""MERGE INTO graft.`$root` t
         |USING (SELECT * FROM VALUES (60L, CAST(-1.0 AS DOUBLE), 'm'),
         |  (1000L, CAST(1.0 AS DOUBLE), 'n') AS src(k, v, s)) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val h2 = Snapshots.readVersion(spark, root)
    assert(h2.where(col("k") === 60).select("v", "s").as[(Double, String)].head()
      == ((-1.0, "m")))
    assert(h2.where(col("k") === 1000).count() == 1)

    // clause-level MERGE: conditional delete + column update + NMBS
    spark.sql(
      s"""MERGE INTO graft.`$root` t
         |USING (SELECT * FROM VALUES (1000L, CAST(5.0 AS DOUBLE)) AS src(k, v)) s
         |ON t.k = s.k
         |WHEN MATCHED AND s.v > 100 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET t.v = s.v + t.v
         |WHEN NOT MATCHED BY SOURCE AND t.k = 60 THEN DELETE""".stripMargin)
    val h3 = Snapshots.readVersion(spark, root)
    assert(h3.where(col("k") === 1000).select("v").as[Double].head() == 6.0,
      "conditional update applied through the cascade")
    assert(h3.where(col("k") === 60).count() == 0, "NOT MATCHED BY SOURCE delete applied")
  }

  test("ALTER TABLE ADD/RENAME/DROP COLUMN and SET TBLPROPERTIES are metadata-only commits") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("k", "v", "s"))
    val filesBefore = Snapshots.versionFiles(spark, root).toSet

    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMNS (w DOUBLE, tag STRING)")
    assert(Snapshots.readVersion(spark, root).columns.toSeq
      == Seq("k", "v", "s", "w", "tag"))
    assert(Snapshots.readVersion(spark, root).where(col("w").isNull).count() == 2,
      "existing rows null-fill the added columns")

    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN v TO amount")
    assert(Snapshots.readVersion(spark, root).columns.contains("amount"))

    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN s")
    assert(!Snapshots.readVersion(spark, root).columns.contains("s"))

    spark.sql(s"ALTER TABLE graft.`$root` SET TBLPROPERTIES ('graft.note' = 'hello')")
    assert(Snapshots.tableProperties(spark, root).get("graft.note").contains("hello"))
    spark.sql(s"ALTER TABLE graft.`$root` UNSET TBLPROPERTIES ('graft.note')")
    assert(!Snapshots.tableProperties(spark, root).contains("graft.note"))

    // ADD/DROP CONSTRAINT: the log's CHECK gate through SQL DDL
    val croot = tmp()
    Snapshots.init(spark, croot, Seq((1L, 5.0)).toDF("k", "v"))
    spark.sql(s"ALTER TABLE graft.`$croot` ADD CONSTRAINT pos CHECK (v > 0)")
    intercept[Exception](
      Snapshots.append(spark, croot, Seq((2L, -1.0)).toDF("k", "v")))
    spark.sql(s"ALTER TABLE graft.`$croot` DROP CONSTRAINT pos")
    Snapshots.append(spark, croot, Seq((2L, -1.0)).toDF("k", "v"))
    assert(Snapshots.readVersion(spark, croot).count() == 2)

    // TRUNCATE TABLE: one empty-overwrite commit, history intact
    val troot = tmp()
    Snapshots.init(spark, troot, Seq((1L, "x")).toDF("k", "s"))
    spark.sql(s"TRUNCATE TABLE graft.`$troot`")
    assert(Snapshots.readVersion(spark, troot).count() == 0)
    assert(Snapshots.readVersion(spark, troot, 0).count() == 1, "v0 survives")

    assert(Snapshots.versionFiles(spark, root).toSet == filesBefore,
      "five ALTERs, zero data files touched")
    assert(Snapshots.readVersion(spark, root)
      .select("k", "amount").orderBy("k").as[(Long, Double)].collect().toSeq
      == Seq((1L, 1.0), (2L, 2.0)), "data reads exactly under the evolved schema")
    // time travel still sees the original shape
    assert(Snapshots.readVersion(spark, root, 0).columns.toSeq == Seq("k", "v", "s"))
  }

  test("catalog stats from the log: rowCount rides CatalogStatistics; small side broadcasts") {
    val big = tmp(); val small = tmp()
    graft.jobs.Snapshots.init(spark, big,
      (1L to 50000L).map(i => (i, i % 97)).toDF("k", "g").repartition(4))
    graft.jobs.Snapshots.init(spark, small,
      (0L until 97L).map(i => (i, s"label$i")).toDF("g", "lbl"))
    // the swapped relation carries the log's CatalogStatistics
    val rel = spark.sql(s"SELECT * FROM graft.`$small`")
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }
    assert(rel.nonEmpty)
    val stats = rel.head.catalogTable.flatMap(_.stats)
    assert(stats.exists(_.rowCount.contains(BigInt(97))),
      s"CatalogStatistics.rowCount must come from the log's #stats envelopes: $stats")
    assert(stats.exists(_.sizeInBytes > 0))
    // and the join between the two CATALOG tables broadcasts the small side
    val joined = spark.sql(
      s"""SELECT b.g, COUNT(*) AS n FROM graft.`$big` b
         |JOIN graft.`$small` s ON b.g = s.g GROUP BY b.g""".stripMargin)
    def joins(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec] =
      p.flatMap {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => Seq(b)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => joins(qs.plan)
        case _ => Nil
      }
    val plan = finalPlanOf(joined)
    assert(joins(plan).nonEmpty, s"expected the 97-row side broadcast, got:\n$plan")
  }

  test("spark.readStream.table over a catalog table tails the log") {
    val root = tmp()
    val cp = Files.createTempDirectory("cat-cp").toFile.getAbsolutePath
    Snapshots.init(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    Snapshots.append(spark, root, Seq((3L, "c")).toDF("k", "s"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.table(s"graft.`$root`")
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.as[(Long, String)].collect().foreach(got.add); ()
      }
      .start()
    q.awaitTermination()
    val b = Seq.newBuilder[(Long, String)]; got.forEach(e => b += e)
    assert(b.result().toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"),
      "the catalog streaming read drains the whole log")

    // …and writeStream.toTable lands exactly-once commits on another log
    val dst = tmp()
    Snapshots.init(spark, dst, Seq.empty[(Long, String)].toDF("k", "s"))
    val q2 = spark.readStream.table(s"graft.`$root`")
      .writeStream
      .format("graft-snapshot")
      .option("checkpointLocation", Files.createTempDirectory("cat-cp2").toFile.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"graft.`$dst`")
    q2.awaitTermination()
    assert(Snapshots.readVersion(spark, dst).as[(Long, String)].collect().toSet
      == Set(1L -> "a", 2L -> "b", 3L -> "c"),
      "streaming catalog-to-catalog pipe lands on the log")
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

  test("SHOW TBLPROPERTIES and DESCRIBE TABLE ride the catalog surface") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"),
      Map("graft.rowTracking" -> "true"))
    val props = spark.sql(s"SHOW TBLPROPERTIES graft.`$root`")
      .as[(String, String)].collect().toMap
    assert(props.get("graft.rowTracking").contains("true"))
    assert(props.contains("graft.identity._row_id.hwm"),
      "engine-maintained props surface too")
    // DESCRIBE TABLE shows the VISIBLE schema: _row_id stays hidden
    val cols = spark.sql(s"DESCRIBE TABLE graft.`$root`")
      .select(col("col_name")).as[String].collect().toSeq
    assert(cols.contains("k") && cols.contains("v") && !cols.contains("_row_id"),
      cols.toString)
  }
}
