package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Dumps, Tables}
import graft.jobs.Snapshots

/** A/B harness for the per-commit write floor (guide §1: measure first).
  * Times (a) the bare `df.write.parquet` of a commit-sized batch, (b) a
  * full engine append, under toggled writer-side knobs (output committer
  * algorithm, _SUCCESS marker, AQE on the write plan) — so a proposed
  * "shave the commit floor" change is accepted or rejected on numbers
  * from the exact write shape the engine issues.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 sbt "runMain graft.WriteProf"
  */
object WriteProf {
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

    val root = s"${Dumps.forSf(sfDir)}/writeprof"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))

    def bestOf(n: Int)(body: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    def report(tag: String): Unit = {
      // bare write of the same batch shape the engine commits
      val bare = bestOf(6) {
        e.where(col("event_id") % 12 === 1).repartition(2)
          .write.mode("overwrite").parquet(s"$root-bare")
      }
      // bare write WITHOUT the repartition exchange (scan -> write)
      val bareNoRep = bestOf(6) {
        e.where(col("event_id") % 12 === 1)
          .write.mode("overwrite").parquet(s"$root-bare")
      }
      // noop of the same frame: plan+scan floor, no write machinery
      val noop = bestOf(6) {
        e.where(col("event_id") % 12 === 1).repartition(2)
          .write.format("noop").mode("overwrite").save()
      }
      // full engine append loop on a fresh table (first is init)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      Snapshots.init(spark, root, e.where(col("event_id") % 12 === 0).repartition(2))
      val appends = (1 to 6).map { b =>
        val t0 = System.nanoTime()
        Snapshots.append(spark, root, e.where(col("event_id") % 12 === b).repartition(2))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[wprof] $tag%-34s noop=$noop%6.3f bare=$bare%6.3f " +
        f"bareNoRep=$bareNoRep%6.3f appendMin=${appends.min}%6.3f " +
        s"appends=${appends.map(a => f"$a%.3f").mkString(",")}")
    }

    report("warmup")
    report("baseline")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    report("committer v2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    report("v2 + no _SUCCESS")
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "1")
    report("v1 + no _SUCCESS")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    report("AQE off (diagnostic only)")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
