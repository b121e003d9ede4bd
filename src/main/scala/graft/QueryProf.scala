package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Generic per-query profiler (guide §1: measure first, §7.3: the driver
  * thread dump is the tool when nothing is running). Runs named registry
  * queries through the same noop-sink protocol as Bench; on the LAST
  * (warmest) run it samples the driver thread and prints a frame
  * histogram plus per-job wall times, so a slow query decomposes into
  * "which engine call" and "driver vs executor".
  *
  *   SPARK_GRAFT_PROF_FILTER=sql_merge_clauses SPARK_GRAFT_SF_DIR=<dir> \
  *     sbt "runMain graft.QueryProf"
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "3").toInt
    val filter = sys.env.getOrElse("SPARK_GRAFT_PROF_FILTER", "sql_merge_clauses")
      .split(',').toSeq
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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { starts.put(j.jobId, j.time); () }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) { jobLog.add((j.jobId, j.time - s)); () }
      }
    })

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => filter.exists(name.contains) }
    selected.foreach { case (name, fn) =>
      println(s"[qprof] ======== $name")
      (1 to runs).foreach { r =>
        jobLog.clear()
        val sample = r == runs
        val main = Thread.currentThread()
        val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
        val sampling = new java.util.concurrent.atomic.AtomicBoolean(sample)
        val sampler = new Thread(() => {
          while (sampling.get()) {
            val st = main.getStackTrace
            val graftFrames = st.filter { f =>
              val c = f.getClassName
              c.startsWith("graft.") && !c.startsWith("graft.QueryProf")
            }.take(3).map(f =>
              s"${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}:${f.getLineNumber}")
            val sparkTop = st.find { f =>
              val c = f.getClassName
              c.contains("datasources") || c.contains("parquet") ||
                c.contains("execution") || c.contains("catalyst") ||
                c.contains("streaming") || c.contains("ml")
            }.map(f => s"${f.getClassName.substring(f.getClassName.lastIndexOf('.') + 1)}.${f.getMethodName}")
              .getOrElse("")
            val key = (Seq(sparkTop).filter(_.nonEmpty) ++ graftFrames).mkString(" <- ")
            hist.merge(if (key.isEmpty) "other" else key, 1, (a, b) => a + b)
            Thread.sleep(10)
          }
        })
        if (sample) { sampler.setDaemon(true); sampler.start() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        sampling.set(false)
        spark.catalog.clearCache()
        import scala.jdk.CollectionConverters._
        val jl = jobLog.asScala.toSeq
        println(f"[qprof] run $r: ${dt}%7.3f s  jobs=${jl.size}%3d  jobTime=${jl.map(_._2).sum / 1e3}%7.3f s")
        if (sample) {
          hist.asScala.toSeq.sortBy(-_._2).take(18).foreach { case (k, n) =>
            println(f"[qprof]   $n%4d  $k")
          }
          val slow = jl.sortBy(-_._2).take(8)
          println("[qprof]   slowest jobs: " +
            slow.map { case (id, ms) => f"#$id:${ms / 1e3}%.2fs" }.mkString(" "))
        }
      }
    }
    spark.stop()
  }
}
