package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEq, GreaterThanOrEqual => CGte, LessThan => CLt, LessThanOrEqual => CLte, Literal => CLit}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.{ChangeFeed, Snapshots}

/** The `spark.read` front door to snapshot tables: versionAsOf time
  * travel, CDC replay via changesFrom/changesTo, and a NATIVE
  * file-source scan whose FileIndex prunes files from the log's stats
  * at plan time. */
class SnapshotSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.SnapshotSource"

  private def freshLog(): String = {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"))
    Snapshots.mergeCow(spark, root,
      Seq((7L, 700.0), (200L, 200.0)).toDF("k", "v"), Seq("k"), changeFeed = true)
    root
  }

  /** The FileSourceScanExec the front-door query planned — its presence
    * IS the native-path assertion (no DSv1 RDD[Row] bridge). */
  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // materialize so AQE finalizes the plan + metrics
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collectLeaves().collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail(s"no FileSourceScanExec in:\n$finalPlan"))
  }

  test("versionAsOf reads the exact historical version; default is latest") {
    val root = freshLog()
    val v0 = spark.read.format(fmt).option("versionAsOf", 0).load(root)
    assert(v0.count() == 100)
    assert(v0.where(col("k") === 7).select("v").as[Double].head() == 7.0)
    val latest = spark.read.format(fmt).load(root)
    assert(latest.count() == 101)
    assert(latest.where(col("k") === 7).select("v").as[Double].head() == 700.0)
  }

  test("changesFrom/changesTo replays the published change feed") {
    val root = freshLog()
    val feed = spark.read.format(fmt)
      .option("changesFrom", 0).option("changesTo", 1).load(root)
    assert(feed.select("k", ChangeFeed.opCol).as[(Long, String)].collect().toSet
      == Set((7L, "update_preimage"), (7L, "update_postimage"), (200L, "insert")))
    // ONE CDC column contract across front doors: the batch option
    // carries _commit_version/_commit_timestamp like the TVF and the
    // streaming CDF (Delta's CDF shape)
    assert(feed.columns.contains("_commit_version") &&
      feed.columns.contains("_commit_timestamp"))
    assert(feed.select("_commit_version").distinct().as[Long].collect().toSeq
      == Seq(1L))
    // half-set options fail loudly
    intercept[Exception](
      spark.read.format(fmt).option("changesFrom", 0).load(root).collect())
    // an EMPTY/inverted range keeps its loud guard through the unified
    // door (never a cryptic empty.reduce)
    val empty = intercept[IllegalArgumentException](
      spark.read.format(fmt)
        .option("changesFrom", 1).option("changesTo", 1).load(root))
    assert(empty.getMessage.contains("empty change range"))
  }

  test("the scan is NATIVE: FileSourceScanExec with pushed filters, not an RDD bridge") {
    val root = freshLog()
    val q = spark.read.format(fmt).load(root).where(col("k").between(10, 19)).select("k")
    val scan = scanOf(q)
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(k,10)"),
      s"row-group pushdown must reach the parquet scan: ${scan.metadata("PushedFilters")}")
    assert(q.as[Long].collect().toSet == (10L to 19L).toSet)
    // a filter the source cannot translate is still applied (by Spark)
    assert(spark.read.format(fmt).load(root).where(col("k") % 2 === 1).count() == 50)
  }

  test("the front door FILE-prunes from the stats index: the planned set shrinks") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      (1L to 4000L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(8))
    val v1 = Snapshots.optimizeCow(spark, root, Seq("k"), 8)
    val all = Snapshots.versionFiles(spark, root, v1)
    val idx = new SnapshotFileIndex(spark, root, v1, None)
    val k = AttributeReference("k", LongType)()
    val surviving = idx.survivingPaths(Seq(CAnd(CGte(k, CLit(100L)), CLte(k, CLit(199L)))))
    assert(surviving.nonEmpty && surviving.size < all.size,
      s"expected a pruned plan, got ${surviving.size} of ${all.size} files")
    assert(surviving.subsetOf(all.toSet))
    // end to end: the PLANNED file count shrinks (scan metrics), rows exact
    val q = spark.read.format(fmt).load(root)
      .where(col("k").between(100, 199)).select("k")
    val scan = scanOf(q)
    assert(scan.metrics("numFiles").value < all.size,
      s"planned ${scan.metrics("numFiles").value} files, table has ${all.size}")
    assert(q.as[Long].collect().toSet == (100L to 199L).toSet)
    // unsatisfiable range plans zero files
    assert(idx.survivingPaths(Seq(CAnd(CGte(k, CLit(10L)), CLte(k, CLit(5L))))).isEmpty)
    assert(spark.read.format(fmt).load(root).where(col("k") > 100000L).count() == 0)
  }

  test("DATE predicates file-prune: internal day literals against INT32 date stats") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    // a year of daily rows, clustered by date — the time-series layout
    Snapshots.init(spark, root,
      (0 until 360).map(i => (java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)), i.toLong))
        .toDF("d", "x")
        .repartitionByRange(6, col("d")).sortWithinPartitions("d"))
    val all = Snapshots.versionFiles(spark, root)
    val idx = new SnapshotFileIndex(spark, root,
      Snapshots.latestVersion(spark, root), None)
    val d = AttributeReference("d", DateType)()
    def day(s: String) = CLit(java.time.LocalDate.parse(s).toEpochDay.toInt, DateType)
    val surviving = idx.survivingPaths(
      Seq(CAnd(CGte(d, day("2024-03-01")), CLt(d, day("2024-04-01")))))
    assert(surviving.nonEmpty && surviving.size < all.size,
      s"a one-month slice of a date-clustered year must prune: ${surviving.size} of ${all.size}")
    // end to end through the REAL planner: scan metrics + exact rows
    val q = spark.read.format(fmt).load(root)
      .where(col("d") >= lit("2024-03-01").cast("date") &&
        col("d") < lit("2024-04-01").cast("date"))
    val scan = scanOf(q)
    assert(scan.metrics("numFiles").value < all.size)
    assert(q.count() == 31)
  }

  test("TIMESTAMP predicates file-prune on micros-opted tables; INT96 default stays sound") {
    def yearOfHours(root: String, props: Map[String, String]): Unit =
      Snapshots.init(spark, root,
        (0 until 360 * 24).map(i => (java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(i)), i.toLong))
          .toDF("ts", "x")
          .repartitionByRange(6, col("ts")).sortWithinPartitions("ts"),
        props = props)
    val ts = AttributeReference("ts", TimestampType)()
    def micros(s: String) = CLit(
      java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
        .getEpochSecond * 1000000L, TimestampType)
    val filters = Seq(CAnd(
      CGte(ts, micros("2024-03-01T00:00:00")), CLt(ts, micros("2024-04-01T00:00:00"))))

    // opted-in table: INT64 micros stats → the planned file set shrinks
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    yearOfHours(root, Map("graft.parquet.timestampMicros" -> "true"))
    val all = Snapshots.versionFiles(spark, root)
    val idx = new SnapshotFileIndex(spark, root,
      Snapshots.latestVersion(spark, root), None)
    val surviving = idx.survivingPaths(filters)
    assert(surviving.nonEmpty && surviving.size < all.size,
      s"a one-month slice of a ts-clustered year must prune: ${surviving.size} of ${all.size}")
    val got = spark.read.format(fmt).load(root)
      .where(col("ts") >= lit("2024-03-01").cast("timestamp") &&
        col("ts") < lit("2024-04-01").cast("timestamp")).count()
    assert(got == 31 * 24)

    // default table (INT96, no stats): nothing prunes, results still exact
    val root2 = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t2"
    yearOfHours(root2, Map.empty)
    val idx2 = new SnapshotFileIndex(spark, root2,
      Snapshots.latestVersion(spark, root2), None)
    assert(idx2.survivingPaths(filters).size
      == Snapshots.versionFiles(spark, root2).size,
      "INT96 timestamps record no stats — pruning must keep every file")
    assert(spark.read.format(fmt).load(root2)
      .where(col("ts") >= lit("2024-03-01").cast("timestamp") &&
        col("ts") < lit("2024-04-01").cast("timestamp")).count() == 31 * 24)
  }

  test("table-property blooms + bloomOn: string point lookups file-prune through spark.read") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    // blooms recorded as TABLE PROPERTIES at init: every commit's writer
    // (init AND the later append) inherits them from the log
    Snapshots.init(spark, root,
      (0L until 2000L).map(i => (i, s"key$i")).toDF("id", "s").repartition(4),
      props = Map(
        "parquet.bloom.filter.enabled#s" -> "true",
        "parquet.bloom.filter.expected.ndv#s" -> "4000"))
    Snapshots.append(spark, root,
      (2000L until 4000L).map(i => (i, s"key$i")).toDF("id", "s").repartition(4))
    assert(Snapshots.tableProperties(spark, root)
      .contains("parquet.bloom.filter.enabled#s"), "props must survive the append")
    val all = Snapshots.versionFiles(spark, root)
    val idx = new SnapshotFileIndex(spark, root,
      Snapshots.latestVersion(spark, root), Some("s"))
    val s = AttributeReference("s", StringType)()
    val surviving = idx.survivingPaths(
      Seq(CEq(s, CLit(UTF8String.fromString("key1234"), StringType))))
    assert(surviving.size < all.size,
      s"bloom must exclude most files: ${surviving.size} of ${all.size}")
    val got = spark.read.format(fmt).option("bloomOn", "s").load(root)
      .where(col("s") === "key1234").select("id").as[Long].collect().toSeq
    assert(got == Seq(1234L))
  }

  test("partitioned + bloomOn: blooms probe partition survivors through the metas-first path") {
    // r18 VERDICT task 4: a bloom-indexed PARTITIONED table used to bail
    // to the status-list path on every plan, paying the per-file render
    // for partitions the filters were about to discard. The metas-first
    // path now partition-prunes on raw checkpoint rows first and probes
    // blooms only over the survivors' rendered statuses.
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      (0L until 4000L).map(i => (i, s"key$i", i % 4)).toDF("id", "s", "p")
        .repartition(4),
      props = Map(
        Snapshots.checkpointFormatProp -> "parquet",
        "graft.partitionBy" -> "p",
        "parquet.bloom.filter.enabled#s" -> "true",
        "parquet.bloom.filter.expected.ndv#s" -> "4000"))
    val idx = new SnapshotFileIndex(spark, root,
      Snapshots.latestVersion(spark, root), Some("s"))
    val all = Snapshots.versionFiles(spark, root)
    val s = AttributeReference("s", StringType)()
    val p = AttributeReference("p", LongType)()
    val sEq = CEq(s, CLit(UTF8String.fromString("key1234"), StringType))
    // bloom pruning engages inside the partitioned metas-first path
    val noPart = idx.listFiles(Nil, Seq(sEq))
    val plannedNoPart = noPart.map(_.files.size).sum
    assert(plannedNoPart > 0 && plannedNoPart < all.size,
      s"bloom must prune through the partitioned path: $plannedNoPart of ${all.size}")
    // a partition filter stacks on top: only p=2 survivors get probed
    val both = idx.listFiles(Seq(CEq(p, CLit(2L, LongType))), Seq(sEq))
    assert(both.forall(_.files.forall(_.getPath.toString.contains("p=2"))))
    val plannedBoth = both.map(_.files.size).sum
    assert(plannedBoth > 0 && plannedBoth <= plannedNoPart)
    // front door answers correctly through partition + bloom pruning
    val got = spark.read.format(fmt).option("bloomOn", "s").load(root)
      .where(col("p") === 2 && col("s") === "key1234")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1234L)) // 1234 % 4 == 2
  }

  test("schema evolution is visible through the front door") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    Snapshots.append(spark, root, Seq((2L, 2.0, "en")).toDF("k", "v", "lang"))
    val head = spark.read.format(fmt).load(root)
    assert(head.columns.toSeq == Seq("k", "v", "lang"))
    assert(head.where(col("lang").isNull).select("k").as[Long].collect().toSeq == Seq(1L))
    val v0 = spark.read.format(fmt).option("versionAsOf", 0).load(root)
    assert(v0.columns.toSeq == Seq("k", "v"))
  }

  test("df.write front door: create, append, overwrite, ignore, errorIfExists") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    // a write against a log-less root CREATES the table (default mode)
    (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v")
      .write.format(fmt).save(root)
    assert(Snapshots.versions(spark, root) == Seq(0L))
    // append lands as an OCC append commit
    (51L to 80L).map(i => (i, i * 1.0)).toDF("k", "v")
      .write.format(fmt).mode("append").save(root)
    assert(Snapshots.versions(spark, root) == Seq(0L, 1L))
    assert(spark.read.format(fmt).load(root).count() == 80)
    // default ErrorIfExists refuses an existing table…
    intercept[Exception](
      Seq((99L, 9.0)).toDF("k", "v").write.format(fmt).save(root))
    // …ignore no-ops against one
    Seq((99L, 9.0)).toDF("k", "v").write.format(fmt).mode("ignore").save(root)
    assert(Snapshots.versions(spark, root) == Seq(0L, 1L))
    assert(spark.read.format(fmt).load(root).count() == 80)
    // overwrite is a ONE-commit full replace with schema REPLACE
    Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .write.format(fmt).mode("overwrite").save(root)
    assert(Snapshots.versions(spark, root) == Seq(0L, 1L, 2L))
    val head = spark.read.format(fmt).load(root)
    assert(head.columns.toSeq == Seq("k", "s") && head.count() == 2)
    // …and time travel still reads the pre-overwrite shape
    val v1 = spark.read.format(fmt).option("versionAsOf", 1).load(root)
    assert(v1.columns.toSeq == Seq("k", "v") && v1.count() == 80)
    // every front-door commit recorded write-time stats in its delta
    assert(Snapshots.statsMissingFromLog(spark, root).isEmpty)
  }

  test("front-door create records table properties; CHECK constraints gate later writes") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    // non-reserved writer options become table properties at create
    (1L to 20L).map(i => (i, i * 1.0)).toDF("k", "v")
      .write.format(fmt)
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("constraint.pos", "v > 0")
      .save(root)
    val props = Snapshots.tableProperties(spark, root)
    assert(props.contains("parquet.bloom.filter.enabled#k"))
    assert(props.get("constraint.pos").contains("v > 0"))
    // the recorded constraint refuses a violating front-door append…
    intercept[Exception](
      Seq((21L, -1.0)).toDF("k", "v").write.format(fmt).mode("append").save(root))
    assert(Snapshots.versions(spark, root) == Seq(0L),
      "a refused batch must leave the log untouched")
    // …and a violating overwrite
    intercept[Exception](
      Seq((1L, -5.0)).toDF("k", "v").write.format(fmt).mode("overwrite").save(root))
    assert(spark.read.format(fmt).load(root).count() == 20)
  }

  test("writeStream sink: exactly-once #txn commits onto the log") {
    val base = Files.createTempDirectory("snapsink").toFile.getAbsolutePath
    val srcDir = base + "/src"; val root = base + "/t"; val cp = base + "/cp"
    (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v")
      .repartition(2).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def run(): Unit =
      spark.readStream.schema(schema).parquet(srcDir)
        .writeStream.format(fmt)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(root)
        .awaitTermination()
    run()
    assert(spark.read.format(fmt).load(root).count() == 100)
    assert(Snapshots.lastCommittedBatch(spark, root) >= 0L,
      "the micro-batch id must ride the committed delta")
    val vsAfterFirst = Snapshots.versions(spark, root)
    // restart on the same checkpoint with no new data: nothing commits
    run()
    assert(Snapshots.versions(spark, root) == vsAfterFirst)
    // new source files: exactly they land as the next commit(s)
    (101L to 150L).map(i => (i, i * 1.0)).toDF("k", "v")
      .write.mode("append").parquet(srcDir)
    run()
    assert(spark.read.format(fmt).load(root).count() == 150)
    // a crash-replayed batch id is a recognized no-op, not a double write
    assert(!Snapshots.commitStreamingBatch(spark, root,
      Seq((999L, 9.0)).toDF("k", "v"), 0L))
    assert(spark.read.format(fmt).load(root).count() == 150)
    // non-append output modes are refused at sink construction
    intercept[Exception] {
      spark.readStream.schema(schema).parquet(srcDir)
        .groupBy(col("k")).count()
        .writeStream.format(fmt)
        .option("checkpointLocation", base + "/cp2")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(base + "/t2")
        .awaitTermination()
    }
  }

  test("timestampAsOf resolves the version a reader at that wall-clock saw") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    Snapshots.append(spark, root, Seq((2L, 2.0)).toDF("k", "v"))
    Snapshots.append(spark, root, Seq((3L, 3.0)).toDF("k", "v"))
    val Seq(t0, t1, t2) =
      (0L to 2L).map(Snapshots.commitTimestamp(spark, root, _))
    // strictly increasing even when commits share a wall-clock millisecond
    assert(t0 < t1 && t1 < t2)
    assert(Snapshots.versionAt(spark, root, t1) == 1L)
    assert(Snapshots.versionAt(spark, root, t1 - 1) == 0L)
    assert(Snapshots.versionAt(spark, root, t2 + 3600000L) == 2L)
    intercept[Exception](Snapshots.versionAt(spark, root, t0 - 1))
    // the front-door option, both spellings (epoch millis + timestamp)
    assert(spark.read.format(fmt)
      .option("timestampAsOf", t1.toString).load(root).count() == 2)
    assert(spark.read.format(fmt)
      .option("timestampAsOf", "2999-01-01 00:00:00").load(root).count() == 3)
    intercept[Exception](spark.read.format(fmt)
      .option("timestampAsOf", t1.toString).option("versionAsOf", 0).load(root))
    // a log written before `#ts:` headers resolves from delta-file mtime
    import scala.jdk.CollectionConverters._
    val d2 = new java.io.File(root, "_log/v00000002.commit")
    val legacy = java.nio.file.Files.readAllLines(d2.toPath).asScala
    java.nio.file.Files.write(d2.toPath,
      (legacy.filterNot(_.startsWith("#ts:")).mkString("\n") + "\n").getBytes("UTF-8"))
    assert(d2.setLastModified(t2))
    assert(Snapshots.versionAt(spark, root, t2) == 2L)
    assert(Snapshots.versionAt(spark, root, t2 - 1) == 1L)
  }

  test("short name resolves via ServiceLoader: format(\"graft-snapshot\") reads the log") {
    val root = freshLog()
    val byShort = spark.read.format("graft-snapshot").load(root)
    val byClass = spark.read.format(fmt).load(root)
    assert(byShort.count() == byClass.count())
  }

  test("SQL front door: CREATE TEMPORARY VIEW ... USING `graft-snapshot` + time travel") {
    val root = freshLog() // v0: 100 rows; v1: merge (k=7 updated, k=200 inserted)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW snap_head
                 |USING `graft-snapshot` OPTIONS (path '$root')""".stripMargin)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW snap_v0
                 |USING `graft-snapshot` OPTIONS (path '$root', versionAsOf '0')""".stripMargin)
    assert(spark.sql("SELECT COUNT(*) FROM snap_head").head().getLong(0) == 101L)
    assert(spark.sql("SELECT COUNT(*) FROM snap_v0").head().getLong(0) == 100L)
    assert(spark.sql("SELECT v FROM snap_head WHERE k = 7").head().getDouble(0) == 700.0)
    assert(spark.sql("SELECT v FROM snap_v0 WHERE k = 7").head().getDouble(0) == 7.0)
    // and the CDC view is SQL-reachable the same way
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW snap_changes
                 |USING `graft-snapshot`
                 |OPTIONS (path '$root', changesFrom '0', changesTo '1')""".stripMargin)
    val ops = spark.sql("SELECT _op, COUNT(*) AS n FROM snap_changes GROUP BY _op")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops == Map("update_preimage" -> 1L, "update_postimage" -> 1L, "insert" -> 1L))
  }

  test("partitioned table: Catalyst partition-prunes the front door to the matching partitions' files") {
    val root = Files.createTempDirectory("snapsrc").toFile.getAbsolutePath + "/t"
    val df = (1L to 1200L).map(i => (i, 2024, (i % 3 + 1).toInt, i * 1.0))
      .toDF("k", "year", "month", "v").repartition(2)
    Snapshots.init(spark, root, df, Map("graft.partitionBy" -> "year,month"))
    val all = Snapshots.versionFiles(spark, root)
    assert(all.forall(_.contains("month=")), "Hive layout expected")
    val monthFiles = all.count(_.contains("month=2"))
    assert(monthFiles > 0 && monthFiles < all.size)

    val front = spark.read.format(fmt).load(root)
    // partition columns surface (after data cols, the file-source shape)
    assert(front.columns.toSet == Set("k", "year", "month", "v"))
    val q = front.where(col("month") === 2).select("k")
    val scan = scanOf(q)
    assert(scan.metrics("numFiles").value == monthFiles,
      s"planned ${scan.metrics("numFiles").value} files; month=2 owns $monthFiles of ${all.size}")
    assert(q.as[Long].collect().toSet == (1L to 1200L).filter(_ % 3 == 1).toSet)
    // the partition filter shows up as a PARTITION filter, not a data filter
    assert(scan.metadata("PartitionFilters").contains("month"),
      s"partition predicate must plan as a partition filter: ${scan.metadata("PartitionFilters")}")
    // combined partition + data predicate: both prunings compose
    val q2 = front.where(col("month") === 2 && col("k") <= 10).select("k")
    assert(q2.as[Long].collect().toSet == Set(1L, 4L, 7L, 10L))
  }
}
