package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The kitchen sink: ONE table carrying row tracking + bucketing + a
  * CHECK constraint + a column DEFAULT + type widening + deletion
  * vectors at the same time, driven through append / COPY-shaped
  * ingest / MOR update / REBUCKET / OPTIMIZE, with the row hash, id
  * stability, constraint gating, default materialization, bucket-plan
  * colocation and the protocol feature list pinned at the end. Each
  * feature is green alone; this spec exists for what only their
  * COMPOSITION shows. */
class FeatureMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("row tracking + bucketing + constraint + default + widening + DVs compose") {
    val root = Files.createTempDirectory("fmx").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      (1 to 200).map(i => (i, i * 10)).toDF("k", "v")
        .withColumn("k", col("k").cast("long")),
      Map("graft.rowTracking" -> "true",
        "graft.bucketBy" -> "k", "graft.buckets" -> "4"))
    Snapshots.addCheckConstraint(spark, root, "v_pos", "v > 0")
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN src STRING DEFAULT 'seed'")
    Snapshots.alterColumnType(spark, root, "v", LongType) // non-bucket widen

    def ids(): Map[Long, Long] = Snapshots.readVersion(spark, root)
      .select(col("k"), col("_row_id")).as[(Long, Long)].collect().toMap
    val ids0 = ids()
    assert(ids0.size == 200 && ids0.values.toSet.size == 200)

    // ingest: absent default + absent ids inject; the constraint gates
    Snapshots.append(spark, root,
      (201 to 220).map(i => (i.toLong, i * 10L)).toDF("k", "v"))
    intercept[IllegalArgumentException](Snapshots.append(spark, root,
      Seq((999L, -5L)).toDF("k", "v")))
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") > 200).where(col("src") =!= "seed").count() == 0)

    // MOR update + REBUCKET + OPTIMIZE: hash and ids stable throughout
    Snapshots.updateWhereMor(spark, root, Map("v" -> "v + 1"), "k <= 50")
    val idsAfterUpd = ids()
    (1L to 200L).foreach(k => assert(idsAfterUpd(k) == ids0(k)))
    Snapshots.rebucket(spark, root, 8)
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30)
    val idsFinal = ids()
    assert(idsFinal.view.filterKeys(_ <= 200).toMap ==
      idsAfterUpd.view.filterKeys(_ <= 200).toMap,
      "rebucket + optimize preserve every id")
    // content: v = 10k+1 for k<=50, 10k above; src = 'seed' everywhere
    val r = Snapshots.readVersion(spark, root)
      .agg(count(lit(1)), sum(col("v")).cast("long"),
        count(when(col("src") === "seed", 1))).head()
    val expSumV = (1L to 220L).map(_ * 10L).sum + 50L
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((220L, expSumV, 220L)), r)

    // the rewrites MATERIALIZED the default (raw parquet shows it)
    val raw = spark.read.parquet(Snapshots.versionFiles(spark, root): _*)
    assert(raw.where(col("src").isNull).count() == 0)

    // bucket plan survives the whole history at the NEW count: a
    // self-join on k plans zero exchanges with broadcast off
    def door = spark.read.format("graft.sources.SnapshotSource").load(root)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = door.select(col("k"), col("v"))
        .join(door.select(col("k"), col("src")), "k")
      j.collect()
      def deep(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => deep(q.plan)
          case o => Seq(o)
        }
      val exec = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      assert(deep(exec).count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) == 0,
        s"co-bucketed self-join stays exchange-free under all features:\n$exec")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // protocol carries the whole feature set
    val (_, _, rfeat, wfeat) = Snapshots.protocol(spark, root)
    assert(rfeat.toSet == Set("columnDefaults", "deletionVectors", "typeWidening"),
      rfeat.toString)
    assert(wfeat.toSet == Set("bucketing", "checkConstraints", "columnDefaults",
      "deletionVectors", "identityColumns", "rowTracking", "typeWidening"),
      wfeat.toString)
  }
}
