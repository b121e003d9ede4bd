package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hash-bucketed snapshot tables (`graft.bucketBy` + `graft.buckets`):
  * every commit re-buckets, file names carry bucket ids, reads plan
  * bucketed scans — co-bucketed joins run with ZERO exchanges and
  * point lookups prune to one bucket's files. */
class BucketedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("bkt").toFile.getAbsolutePath + "/t"

  private def executed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  private def deep(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => deep(q.plan)
      case o => Seq(o)
    }

  private val props = Map("graft.bucketBy" -> "k", "graft.buckets" -> "4")

  test("commits re-bucket, names carry bucket ids, content round-trips") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(7), props)
    Snapshots.append(spark, root, (201L to 300L).map(i => (i, i * 1.0)).toDF("k", "v"))
    val files = Snapshots.versionFiles(spark, root)
    assert(files.forall(f =>
      org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(new org.apache.hadoop.fs.Path(f).getName).isDefined),
      s"every committed file parses a bucket id: $files")
    assert(Snapshots.readVersion(spark, root).count() == 300)
    assert(Snapshots.readVersion(spark, root).select(sum($"k")).as[Long].head() ==
      (1L to 300L).sum)
  }

  test("a co-bucketed join plans ZERO shuffle exchanges") {
    val a = tmp(); val b = tmp()
    Snapshots.init(spark, a,
      (1L to 400L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(5), props)
    Snapshots.init(spark, b,
      (200L to 600L).map(i => (i, i * 2.0)).toDF("k", "w").repartition(3), props)
    def door(r: String) =
      spark.read.format("graft.sources.SnapshotSource").load(r)
    val joined = door(a).join(door(b), "k")
      .withColumn("s", $"v" + $"w")
    // disable broadcast so the join must satisfy distribution by
    // partitioning — the bucketed scans provide it without an Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executed(joined)
      val nodes = deep(plan)
      assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 0,
        s"no exchange anywhere in:\n$plan")
      val scans = nodes.collect { case f: FileSourceScanExec => f }
      assert(scans.size == 2 && scans.forall(_.bucketedScan),
        "both sides planned as bucketed scans")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(joined.count() == 201)
  }

  test("an equality predicate on the bucket key prunes to one bucket's files") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 1000L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(9), props)
    val all = Snapshots.versionFiles(spark, root).size
    assert(all > 1)
    val q = spark.read.format("graft.sources.SnapshotSource").load(root)
      .where($"k" === 777L)
    // force the bucketed read path (autoBucketedScan would fall back to
    // a plain scan for a lone filter; pruning rides the bucketed path)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val scan = deep(executed(q)).collectFirst {
        case f: FileSourceScanExec => f }.get
      assert(scan.bucketedScan)
      assert(scan.optionalBucketSet.exists(_.cardinality() == 1),
        "planner selected exactly one bucket")
      assert(q.count() == 1)
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("OPTIMIZE ... REBUCKET n: full rewrite re-stamps ids; hash and zero-exchange joins hold at the new count") {
    val a = tmp(); val b = tmp()
    Snapshots.init(spark, a,
      (1L to 400L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(5), props)
    Snapshots.init(spark, b,
      (200L to 600L).map(i => (i, i * 2.0)).toDF("k", "w"), props)
    val filesBefore = Snapshots.versionFiles(spark, a).toSet
    // SQL door: a's count changes 4 -> 8 in ONE rewrite commit
    val v = spark.sql(s"OPTIMIZE graft.`$a` REBUCKET 8").head().getLong(0)
    assert(v == 1L)
    assert(Snapshots.tableProperties(spark, a)("graft.buckets") == "8")
    val filesAfter = Snapshots.versionFiles(spark, a)
    assert(filesAfter.toSet.intersect(filesBefore).isEmpty, "full rewrite")
    assert(filesAfter.forall(f =>
      org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(new org.apache.hadoop.fs.Path(f).getName).isDefined),
      s"new files carry bucket ids: $filesAfter")
    // hash unchanged; the old version still reads under ITS OWN count
    assert(Snapshots.readVersion(spark, a).select(sum($"k")).as[Long].head() ==
      (1L to 400L).sum)
    assert(Snapshots.readVersion(spark, a, 0L).count() == 400)
    // re-bucket b to the SAME count: the co-bucketed join is exchange-free
    // again at 8 — the partitioning guarantee survived the evolution
    Snapshots.rebucket(spark, b, 8)
    def door(r: String) =
      spark.read.format("graft.sources.SnapshotSource").load(r)
    val joined = door(a).join(door(b), "k").withColumn("s", $"v" + $"w")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val nodes = deep(executed(joined))
      assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 0,
        s"no exchange after REBUCKET:\n${executed(joined)}")
      val scans = nodes.collect { case f: FileSourceScanExec => f }
      assert(scans.size == 2 && scans.forall(_.bucketedScan))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(joined.count() == 201)
    // point lookups keep pruning to ONE bucket at the new count
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = door(a).where($"k" === 137L)
      val scan = deep(executed(q)).collectFirst {
        case f: FileSourceScanExec => f }.get
      assert(scan.bucketedScan &&
        scan.optionalBucketSet.exists(_.cardinality() == 1))
      assert(q.count() == 1)
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    // guards: non-bucketed tables refuse; WHERE/ZORDER don't compose
    val plain = tmp()
    Snapshots.init(spark, plain, Seq((1L, 1.0)).toDF("k", "v"))
    intercept[IllegalArgumentException](Snapshots.rebucket(spark, plain, 8))
    intercept[Exception](
      spark.sql(s"OPTIMIZE graft.`$a` WHERE k > 0 REBUCKET 8"))
  }

  test("structural guards: no ALTER into bucketing, no clusterBy overlap") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    intercept[IllegalArgumentException](
      Snapshots.setProperties(spark, root, Map("graft.bucketBy" -> "k")))
    val bad = tmp()
    intercept[IllegalArgumentException](
      Snapshots.init(spark, bad, Seq((1L, 1.0)).toDF("k", "v"),
        props + ("graft.clusterBy" -> "v")))
  }

  test("DETERMINISTIC layout-race refusals: both rebase directions") {
    // the storm proves the guards probabilistically; this schedules the
    // two races exactly. Direction 1: an adds-only commit (a pure-insert
    // merge's shape — no removes, so the remove-overlap clash never
    // fires) computed against a pre-REBUCKET base must refuse the
    // rebase: its files are stamped under the OLD layout.
    val a = tmp()
    Snapshots.init(spark, a,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"), props)
    val baseA = Snapshots.readDelta(spark, a, 0L)
    Snapshots.rebucket(spark, a, 8) // the winner at v1
    val e1 = intercept[IllegalStateException](
      Snapshots.commitRewriteRetry(spark, a, 1L,
        Snapshots.Delta(Seq("data/stale-stamped.parquet"), Nil,
          schema = baseA.schema, props = baseA.props, op = Some("merge"))))
    assert(e1.getMessage.contains("bucket layout"), e1.getMessage)
    assert(Snapshots.latestVersion(spark, a) == 1L, "nothing committed")

    // Direction 2: a REBUCKET computed against a stale base must refuse
    // once a concurrent APPEND added files stamped under the old count.
    val b = tmp()
    Snapshots.init(spark, b,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v"), props)
    val baseB = Snapshots.readDelta(spark, b, 0L)
    Snapshots.append(spark, b, Seq((101L, 101.0)).toDF("k", "v")) // winner at v1
    val e2 = intercept[IllegalStateException](
      Snapshots.commitRewriteRetry(spark, b, 1L,
        Snapshots.Delta(Seq("data/rebucketed.parquet"), baseB.adds,
          schema = baseB.schema,
          props = baseB.props + ("graft.buckets" -> "8"),
          op = Some("optimize"))))
    assert(e2.getMessage.contains("bucket layout"), e2.getMessage)
    assert(Snapshots.tableProperties(spark, b)("graft.buckets") == "4",
      "the stale REBUCKET must not land its count")
    assert(Snapshots.readVersion(spark, b).count() == 101)
  }
}
