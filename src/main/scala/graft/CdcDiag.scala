package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Dumps, Tables}
import graft.jobs.Snapshots

/** Diagnostic main for the CDC streaming fixed costs (VERDICT r19 task 1:
  * `stream_pipe_cdc_ivm` carries ~1 s/micro-batch). Replays the exact
  * query body with phase timers and prints each micro-batch's engine
  * duration breakdown (`durationMs`: triggerExecution = total,
  * latestOffset/getBatch = the graft source's share, addBatch = the
  * foreachBatch apply incl. the replica COW commit, walCommit/commitOffsets
  * = Spark's checkpoint I/O) — so "streaming overhead" decomposes into
  * source, sink, and engine terms instead of being guessed at.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 sbt "runMain graft.CdcDiag"
  */
object CdcDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[cdcdiag] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 3).foreach { run =>
      println(s"[cdcdiag] ==== run $run")
      val base = Dumps.forSf(sfDir)
      val srcRoot = s"$base/cdcivmsrc"
      val dstRoot = s"$base/cdcivmdst"
      val cp = s"$base/cdcivm_cp"
      val fs = new org.apache.hadoop.fs.Path(srcRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(srcRoot, dstRoot, cp).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      timed("init v0")(Snapshots.init(spark, srcRoot, e.repartition(2)))
      val src = e.where(col("event_id") % 10 === 0)
        .withColumn("value", col("value") * 2)
        .unionByName(e.where(col("event_id") % 10 === 7)
          .withColumn("event_id", col("event_id") + 10000000L)
          .withColumn("value", col("value") + 1))
      timed("mergeCow v1")(
        Snapshots.mergeCow(spark, srcRoot, src, Seq("event_id"), changeFeed = true))
      timed("deleteKeysCow v2")(Snapshots.deleteKeysCow(spark, srcRoot,
        e.where(col("event_id") % 9 === 4).select(col("event_id")),
        Seq("event_id"), changeFeed = true))
      val q = timed("stream (3 batches)") {
        val q = spark.readStream.format("graft-snapshot")
          .option("readChangeFeed", "true")
          .option("maxVersionsPerTrigger", "1")
          .load(srcRoot)
          .writeStream
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            Snapshots.applyCdcBatch(spark, dstRoot, batch, Seq("event_id"), id); ()
          }
          .start()
        q.awaitTermination()
        q
      }
      q.recentProgress.foreach { p =>
        println(s"[cdcdiag]   batch ${p.batchId}: in=${p.numInputRows} durations=${p.durationMs}")
      }
      timed("equality proof") {
        val a = Snapshots.readVersion(spark, srcRoot)
        val b = Snapshots.readVersion(spark, dstRoot)
        a.withColumn("__s", lit(1L))
          .unionByName(b.withColumn("__s", lit(-1L)))
          .groupBy(a.columns.map(col): _*).agg(sum(col("__s")).as("__d"))
          .where(col("__d") =!= 0L).isEmpty
      }
      timed("commit-grain probe") {
        Snapshots.history(spark, dstRoot).count() == 3L &&
          Snapshots.lastCommittedBatch(spark, dstRoot) == 2L
      }
      timed("final agg") {
        Snapshots.readVersion(spark, dstRoot).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("event_id")).cast("bigint").as("id_sum"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("value_sum"))
          .orderBy(col("event_type"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
