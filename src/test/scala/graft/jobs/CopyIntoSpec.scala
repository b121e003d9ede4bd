package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** COPY INTO: idempotent landing-zone ingest. Every source file loads
  * exactly once (identity = path|size|mtime tracked via `#copied:` log
  * markers); re-runs are no-ops, new landings load incrementally, the
  * ingested-set survives checkpoints and vacuum, and a re-written
  * source file (new bytes ⇒ new identity) loads again. */
class CopyIntoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def land(dir: String, sub: String, from: Long, until: Long): Unit =
    (from until until).map(i => (i, s"u$i", i * 1.5)).toDF("k", "name", "v")
      .coalesce(1).write.parquet(s"$dir/$sub")

  test("COPY INTO is idempotent and incremental through the SQL door") {
    val root = tmp("cpy") + "/t"
    val landing = tmp("cpyland")
    Snapshots.init(spark, root,
      Seq((0L, "u0", 0.0)).toDF("k", "name", "v"))
    land(landing, "b0", 1, 50)
    land(landing, "b1", 50, 100)

    val r1 = spark.sql(
      s"COPY INTO graft.`$root` FROM '$landing' FILEFORMAT = PARQUET").head()
    assert(r1.getLong(0) == 2L, s"two landed files load: $r1")
    assert(r1.getLong(2) == 99L, "rows_inserted from the commit's stats")

    val r2 = spark.sql(
      s"COPY INTO graft.`$root` FROM '$landing' FILEFORMAT = PARQUET").head()
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 2L, s"re-run is a no-op: $r2")
    assert(Snapshots.latestVersion(spark, root) == 1L,
      "a no-op COPY commits nothing")

    land(landing, "b2", 100, 120)
    val r3 = spark.sql(
      s"COPY INTO graft.`$root` FROM '$landing' FILEFORMAT = PARQUET").head()
    assert(r3.getLong(0) == 1L && r3.getLong(1) == 2L, s"only the new file: $r3")

    assert(Snapshots.readVersion(spark, root).count() == 120L)
    assert(Snapshots.readVersion(spark, root).agg(sum($"k")).head().getLong(0)
      == (0L until 120L).sum)
  }

  test("COPY_OPTIONS force reloads; PATTERN scopes the listing") {
    val root = tmp("cpyf") + "/t"
    val landing = tmp("cpyflnd")
    land(landing, "keep", 0, 10)
    land(landing, "skip", 10, 20)
    Snapshots.init(spark, root, Seq.empty[(Long, String, Double)]
      .toDF("k", "name", "v"))

    val r1 = spark.sql(s"COPY INTO graft.`$root` FROM '$landing' " +
      "FILEFORMAT = PARQUET PATTERN = 'keep/*'").head()
    assert(r1.getLong(0) == 1L, s"pattern admits one file: $r1")
    assert(Snapshots.readVersion(spark, root).count() == 10L)

    val r2 = spark.sql(s"COPY INTO graft.`$root` FROM '$landing' " +
      "FILEFORMAT = PARQUET PATTERN = 'keep/*' COPY_OPTIONS ('force'='true')")
      .head()
    assert(r2.getLong(0) == 1L, "force ignores the ingested set")
    assert(Snapshots.readVersion(spark, root).count() == 20L,
      "forced reload doubles the rows — exactly the footgun the default prevents")
  }

  test("CSV lands under the table's own schema; unknown source columns are refused") {
    val root = tmp("cpycsv") + "/t"
    val landing = tmp("cpycsvl")
    Snapshots.init(spark, root, Seq((0L, "u0", 0.5)).toDF("k", "name", "v"))
    (1L to 5L).map(i => (i, s"u$i", i * 2.0)).toDF("k", "name", "v")
      .coalesce(1).write.option("header", "true").csv(s"$landing/c0")
    val r = Snapshots.copyInto(spark, root, landing, format = "csv",
      formatOptions = Map("header" -> "true"))
    assert(r.filesLoaded == 1L && r.rowsInserted == 5L)
    assert(Snapshots.readVersion(spark, root).agg(sum($"v")).head().getDouble(0)
      == 0.5 + (1 to 5).map(_ * 2.0).sum)

    val wide = tmp("cpywide")
    Seq((9L, "x", 1.0, "EXTRA")).toDF("k", "name", "v", "oops")
      .write.parquet(s"$wide/w0")
    val e = intercept[IllegalArgumentException] {
      Snapshots.copyInto(spark, root, wide)
    }
    assert(e.getMessage.contains("oops"), "the refusal names the column")
  }

  test("the ingested set survives checkpoints and vacuum; a rewritten file reloads") {
    val root = tmp("cpyv") + "/t"
    val landing = tmp("cpyvl")
    Snapshots.init(spark, root, Seq((0L, "u0", 0.0)).toDF("k", "name", "v"))
    land(landing, "b0", 1, 10)
    assert(Snapshots.copyInto(spark, root, landing).filesLoaded == 1L)

    // push the log past a checkpoint boundary, then vacuum away the
    // ingesting delta — the floor checkpoint must carry the union
    (1 to 12).foreach { i =>
      Snapshots.append(spark, root, Seq((1000L + i, "a", 1.0)).toDF("k", "name", "v"))
    }
    val head = Snapshots.latestVersion(spark, root)
    Snapshots.vacuum(spark, root, keepFrom = head - 1)
    assert(Snapshots.copyInto(spark, root, landing).filesLoaded == 0L,
      "vacuum must not resurrect a double-load")

    // rewriting the landing file (different bytes ⇒ different size)
    // changes its identity: it loads again by design
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$landing/b0"), true)
    land(landing, "b0", 1, 30)
    assert(Snapshots.copyInto(spark, root, landing).filesLoaded == 1L,
      "new bytes at the same logical landing path re-ingest")
  }

  test("CSV lacking identity + generated partition columns: injected, not NULL") {
    // CSV/JSON read under the FULL table schema, so columns absent from
    // the source arrive present-but-all-NULL — before the all-NULL drop,
    // identity ids landed NULL and the generated PARTITION value landed
    // NULL, making copied rows invisible to partition-filtered reads.
    val root = tmp("cpyid") + "/t"
    val landing = tmp("cpyidl")
    Snapshots.init(spark, root,
      Seq((100L, "2024-01-01 10:00:00", 1.0))
        .toDF("ts_raw", "ts", "v")
        .select(col("ts_raw").cast("long").as("k"),
          col("ts").cast("timestamp").as("ts"), col("v"))
        .withColumn("day", to_date(col("ts"))),
      Map("graft.identity.rid" -> "1,1",
        "graft.partitionBy" -> "day",
        "graft.generated.day" -> "date(ts)"))
    // the landing CSV carries ONLY k, ts, v — no rid, no day
    new java.io.File(s"$landing/b0").mkdirs()
    val w = new java.io.PrintWriter(s"$landing/b0/part.csv")
    w.println("k,ts,v")
    w.println("200,2024-02-02 08:30:00,2.5")
    w.println("201,2024-02-02 09:15:00,3.5")
    w.close()
    val r = Snapshots.copyInto(spark, root, landing, format = "csv",
      formatOptions = Map("header" -> "true"))
    assert(r.filesLoaded == 1L && r.rowsInserted == 2L, r.toString)
    val copied = Snapshots.readVersion(spark, root).where(col("k") >= 200L)
    // identity ids allocated (non-NULL, advancing the hwm), generated
    // partition values computed from the batch's own ts
    assert(copied.where(col("rid").isNull).count() == 0L,
      "identity ids must be injected, never NULL")
    assert(copied.where(col("day").isNull).count() == 0L,
      "generated partition values must be computed, never NULL")
    val hwm = Snapshots.tableProperties(spark, root)("graft.identity.rid.hwm").toLong
    assert(hwm >= 2L, s"hwm advanced past the copied batch: $hwm")
    // THE symptom the bug caused: rows visible through a
    // partition-FILTERED read (NULL day was pruned away before the fix)
    assert(Snapshots.readVersion(spark, root)
      .where(col("day") === lit("2024-02-02").cast("date")).count() == 2L,
      "copied rows must be visible through a partition-filtered read")
    val files = Snapshots.versionFiles(spark, root)
    assert(files.exists(_.contains("day=2024-02-02")),
      s"copied rows land in a REAL partition directory: $files")

    // a CSV that DOES carry explicit identity + generated values keeps
    // pass-through (CSV maps positionally under the table schema, so the
    // file carries every column in schema order: k,ts,v,day,rid)
    val w2 = new java.io.PrintWriter(s"$landing/b0/part2.csv")
    w2.println("k,ts,v,day,rid")
    w2.println("300,2024-03-03 12:00:00,4.5,2024-03-03,9000")
    w2.close()
    val r2 = Snapshots.copyInto(spark, root, landing, format = "csv",
      formatOptions = Map("header" -> "true"))
    assert(r2.filesLoaded == 1L && r2.rowsInserted == 1L, r2.toString)
    assert(Snapshots.readVersion(spark, root).where(col("k") === 300L)
      .select(col("rid")).head().getLong(0) == 9000L,
      "explicit identity values pass through untouched")
  }

  test("COPY INTO a partitioned table lands Hive layout and prunes") {
    val root = tmp("cpyp") + "/t"
    val landing = tmp("cpypl")
    Snapshots.init(spark, root,
      Seq((1L, "a", 1.0)).toDF("k", "part", "v"),
      Map("graft.partitionBy" -> "part"))
    Seq((2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "part", "v")
      .coalesce(1).write.parquet(s"$landing/b0")
    val r = Snapshots.copyInto(spark, root, landing)
    assert(r.filesLoaded == 1L && r.rowsInserted == 2L)
    val files = Snapshots.versionFiles(spark, root)
    assert(files.exists(_.contains("part=b")) && files.exists(_.contains("part=c")),
      s"copied rows land in the table's Hive layout: $files")
  }
}
