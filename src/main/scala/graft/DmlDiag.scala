package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.jobs.{ChangeFeed, Snapshots, SnapshotSql}

/** Diagnostic main for the r11 predicate-DML bench deltas
  * (`update_where_sql` 0.64 → 1.28 s, `delete_where_mor` 0.71 → 1.46 s
  * warm vs r10). The registry queries run 4-6 heavyweight stages each;
  * this main times them separately, min-of-N, so the delta can be
  * attributed to a STAGE (init/stats write, victim selection + COW,
  * history/feed reads, final aggregate) rather than guessed at.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.DmlDiag"
  */
object DmlDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_DIAG_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      best.update(name, math.min(best.getOrElse(name, Double.MaxValue), s))
      r
    }

    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))

    for (i <- 1 to iters) {
      println(s"--- iteration $i")
      // ---- update_where_sql stages
      locally {
        val root = "/tmp/dmldiag/upd"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        timed("upd: init") {
          Snapshots.init(spark, root,
            e.repartitionByRange(6, col("event_id")).sortWithinPartitions("event_id"))
        }
        timed("upd: sql update") {
          SnapshotSql.register("events_diag_upd", root)
          SnapshotSql.sql(spark,
            "UPDATE events_diag_upd SET value = value * 3 WHERE event_id < 500",
            changeFeed = true)
          SnapshotSql.unregister("events_diag_upd")
        }
        timed("upd: history") {
          Snapshots.history(spark, root).where(col("version") === 1).head()
        }
        timed("upd: feed count") {
          Snapshots.changesBetween(spark, root, 0, 1)
            .where(col(ChangeFeed.opCol)
              .isin("update_preimage", "update_postimage")).count()
        }
        timed("upd: final agg") {
          Snapshots.readVersion(spark, root)
            .agg(count(lit(1)), sum(col("event_id")),
              sum(col("value").cast("decimal(12,2)")).cast("double"))
            .collect()
        }
      }
      // ---- sql_table_changes stages (the 2.52x 10x-scale row, r11/r12
      // verdicts): init + COW merge + COW delete-by-keys are EACH
      // full-table-write-grain at this key distribution (event_id % 10
      // spreads matches into every file), so the query's cost is ~3
      // table writes + the feed reads; the TVF read itself is
      // O(changed rows). Timing the stages separately attributes the
      // scale ratio to setup writes vs the reader.
      locally {
        val root = "/tmp/dmldiag/tc"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        timed("tc: init") { Snapshots.init(spark, root, e) }
        val updates = e.where(col("event_id") % 10 === 0)
          .withColumn("value", col("value") * 2)
        val inserts = e.where(col("event_id") % 10 === 7)
          .withColumn("event_id", col("event_id") + 10000000L)
          .withColumn("value", col("value") + 1)
        timed("tc: mergeCow") {
          Snapshots.mergeCow(spark, root, updates.unionByName(inserts),
            Seq("event_id"), changeFeed = true)
        }
        timed("tc: deleteKeysCow") {
          Snapshots.deleteKeysCow(spark, root,
            e.where(col("event_id") % 13 === 4).select(col("event_id")),
            Seq("event_id"), changeFeed = true)
        }
        timed("tc: tvf read+agg") {
          spark.sql(
            s"""SELECT _op, COUNT(*) AS n,
               |  CAST(SUM(event_id) AS BIGINT) AS id_sum,
               |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum,
               |  COUNT(DISTINCT _commit_timestamp) AS n_ts
               |FROM table_changes('graft.`$root`', 1, 2)
               |GROUP BY _op ORDER BY _op""".stripMargin).collect()
        }
      }
      // ---- sql_copy_into stages (2.17x 10x-scale row)
      locally {
        val base = "/tmp/dmldiag/cpy"
        val root = s"$base/t"; val landing = s"$base/landing"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        timed("cpy: init") {
          Snapshots.init(spark, root, e.where(col("event_id") % 4 === 3))
        }
        timed("cpy: landing writes") {
          e.where(col("event_id") % 4 === 0).coalesce(1).write.parquet(s"$landing/b0")
          e.where(col("event_id") % 4 === 1).coalesce(1).write.parquet(s"$landing/b1")
          e.where(col("event_id") % 4 === 2).coalesce(1).write.parquet(s"$landing/b2")
        }
        timed("cpy: first copy (3 files)") {
          Snapshots.copyInto(spark, root, landing)
        }
        timed("cpy: rerun (noop)") {
          Snapshots.copyInto(spark, root, landing)
        }
        timed("cpy: final agg") {
          Snapshots.readVersion(spark, root)
            .groupBy(col("event_type"))
            .agg(count(lit(1)), sum(col("event_id")),
              sum(col("value").cast("decimal(12,2)")).cast("double"))
            .collect()
        }
      }
      // ---- delete_where_mor stages
      locally {
        val root = "/tmp/dmldiag/mor"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        timed("mor: init") {
          Snapshots.init(spark, root,
            e.repartitionByRange(6, col("event_id")).sortWithinPartitions("event_id"))
        }
        timed("mor: deleteWhereMor") {
          Snapshots.deleteWhereMor(spark, root, "event_id < 1000", changeFeed = true)
        }
        timed("mor: history+dv") {
          Snapshots.history(spark, root).where(col("version") === 1).head()
          Snapshots.liveDeletionVectors(spark, root)
        }
        timed("mor: feed count") {
          Snapshots.changesBetween(spark, root, 0, 1)
            .where(col(ChangeFeed.opCol) === "delete").count()
        }
        timed("mor: front-door agg") {
          spark.read.format("graft.sources.SnapshotSource").load(root)
            .agg(count(lit(1)), sum(col("event_id"))).head()
        }
        timed("mor: materialize") { Snapshots.materializeDeletionVectors(spark, root) }
        timed("mor: post-mat agg") {
          Snapshots.readVersion(spark, root)
            .agg(count(lit(1)), sum(col("event_id"))).head()
        }
      }
    }
    println("--- best of " + iters)
    best.foreach { case (n, s) => println(f"[dmldiag] $n%-22s $s%8.3f s") }
    println(f"[dmldiag] upd total ${best.filter(_._1.startsWith("upd")).values.sum}%.3f  " +
      f"mor total ${best.filter(_._1.startsWith("mor")).values.sum}%.3f")
    spark.stop()
  }
}
