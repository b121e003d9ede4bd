package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Dumps, Tables}
import graft.jobs.Snapshots

/** Profiling main for the multi-commit lifecycle harnesses that dominate
  * the bench total (guide §1: measure first). Replays the exact commit
  * sequence of `partitioned_pq_prune` / `parquet_checkpoint_prune` with a
  * per-phase wall timer AND a Spark job counter, so the fixed per-commit
  * cost decomposes into "Spark jobs launched" vs "driver-side log work".
  *
  *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 sbt "runMain graft.CommitProf"
  */
object CommitProf {
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

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val verbose = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(j.jobId, (j.time, site)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) {
          jobMs.addAndGet(j.time - s._1)
          if (verbose.get())
            println(f"[prof]     job ${j.jobId}%3d ${(j.time - s._1) / 1e3}%7.3f s  ${s._2}")
          ()
        }
      }
    })

    def drain(): Unit = Thread.sleep(80) // listener bus settles quickly at this scale
    def timed[A](name: String)(body: => A): A = {
      drain()
      val j0 = jobs.get(); val m0 = jobMs.get()
      val t0 = System.nanoTime()
      val r = body
      drain()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $name%-34s ${dt}%8.3f s  jobs=${jobs.get() - j0}%3d  jobTime=${(jobMs.get() - m0) / 1e3}%8.3f s")
      r
    }

    val fsRoot = s"${Dumps.forSf(sfDir)}/profpartpq"
    val fs = new org.apache.hadoop.fs.Path(fsRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    (1 to 2).foreach { round =>
      println(s"[prof] ==== round $round (${if (round == 1) "cold" else "warm"})")
      fs.delete(new org.apache.hadoop.fs.Path(fsRoot), true)
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      timed("events scan+filter+noop (floor)") {
        e.where(col("event_id") % 12 === 0).repartition(2)
          .write.format("noop").mode("overwrite").save()
      }
      timed("plain parquet write (floor)") {
        e.where(col("event_id") % 12 === 0).repartition(2)
          .write.mode("overwrite").parquet(s"$fsRoot-floor")
      }
      fs.delete(new org.apache.hadoop.fs.Path(s"$fsRoot-floor"), true)
      timed("init (partitioned, pq ckpt)") {
        Snapshots.init(spark, fsRoot, e.where(col("event_id") % 12 === 0).repartition(2),
          Map("graft.partitionBy" -> "event_type",
            Snapshots.checkpointFormatProp -> "parquet"))
      }
      def sampled[A](tag: String, top: Int = 14)(body: => A): A = {
        val main = Thread.currentThread()
        val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
        val sampler = new Thread(() => {
          while (sampling.get()) {
            val st = main.getStackTrace
            val graftFrames = st.filter(f => f.getClassName.startsWith("graft."))
              .take(2).map(f => s"${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}:${f.getLineNumber}")
            val sparkTop = st.find(f =>
              f.getClassName.contains("datasources") ||
                f.getClassName.contains("parquet") ||
                f.getClassName.contains("execution") ||
                f.getClassName.contains("catalyst"))
              .map(f => s"${f.getClassName.substring(f.getClassName.lastIndexOf('.') + 1)}.${f.getMethodName}")
              .getOrElse("")
            val key = (Seq(sparkTop).filter(_.nonEmpty) ++ graftFrames).mkString(" <- ")
            hist.merge(if (key.isEmpty) "other" else key, 1, (a, b2) => a + b2)
            Thread.sleep(15)
          }
        })
        sampler.setDaemon(true)
        sampler.start()
        val r = body
        sampling.set(false)
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2).take(top).foreach { case (k, n) =>
          println(f"[prof]     [$tag] $n%4d  $k")
        }
        r
      }

      (1 to 11).foreach { b =>
        if (b == 10) {
          verbose.set(true)
          sampled("ckpt") {
            timed(s"append $b") {
              Snapshots.append(spark, fsRoot,
                e.where(col("event_id") % 12 === b).repartition(2))
            }
          }
          verbose.set(false)
        } else if (b == 7 && round == 2) {
          sampled("append") {
            timed(s"append $b") {
              Snapshots.append(spark, fsRoot,
                e.where(col("event_id") % 12 === b).repartition(2))
            }
          }
        } else timed(s"append $b") {
          Snapshots.append(spark, fsRoot,
            e.where(col("event_id") % 12 === b).repartition(2))
        }
      }
      val head = timed("latestVersion")(Snapshots.latestVersion(spark, fsRoot))
      val pred = "event_type = 'click' AND event_id BETWEEN 100 AND 40000"
      timed("statsCandidateFiles (dist)") {
        Snapshots.statsCandidateFiles(spark, fsRoot, head, pred)
      }
      spark.conf.set("spark.graft.prune.distributed", "never")
      timed("statsCandidateFiles (driver)") {
        Snapshots.statsCandidateFiles(spark, fsRoot, head, pred)
      }
      spark.conf.unset("spark.graft.prune.distributed")
      timed("versionFiles")(Snapshots.versionFiles(spark, fsRoot).size)
      timed("front-door filtered agg") {
        spark.read.format("graft.sources.SnapshotSource").load(fsRoot)
          .where(col("event_type") === "click" && col("event_id").between(100L, 40000L))
          .agg(count(lit(1)), sum(col("event_id")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
