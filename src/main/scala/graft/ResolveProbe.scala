package graft

import org.apache.spark.sql.SparkSession

import graft.jobs.Snapshots

/** Diagnostic: decompose `versionFiles` (full live-list resolution) on
  * an existing snapshot table — scan-only vs collect vs end-to-end —
  * so a slow resolve_cold cell is attributable to the read, the
  * driver decode, or the sort. Usage:
  *   runMain graft.ResolveProbe <tableRoot> [reps]
  */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val head = Snapshots.latestVersion(spark, root)
    println(s"[probe] head=$head")
    // scan-only: the distributed read of the assembly, nothing collected
    val ckpts = new org.apache.hadoop.fs.Path(root + "/_log")
    val fs = ckpts.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pq = fs.listStatus(ckpts).map(_.getPath)
      .filter(_.getName.endsWith(".checkpoint.parquet")).maxBy(_.getName)
    (1 to reps).foreach { i =>
      time(s"scan-count#$i") {
        println("  rows=" + spark.read.parquet(pq.toString)
          .where("kind = 'file'").select("path", "fsize", "mtime").count())
      }
    }
    // the REAL assembly (manifest fresh ∪ sidecars), scan-only then packed
    import org.apache.spark.sql.functions._
    val hdrs = new org.apache.hadoop.fs.Path(pq, "_headers")
    val manMeta =
      if (fs.exists(hdrs)) spark.read.parquet(hdrs.toString)
      else spark.read.parquet(pq.toString)
    val refNames = manMeta.where("kind = 'sidecar'")
      .select("hval").collect().map(_.getString(0)).toSeq
    println(s"[probe] sidecar refs: ${refNames.size}")
    if (refNames.nonEmpty) {
      def assembly = (spark.read.parquet(pq.toString) +:
        refNames.map(n => spark.read.parquet(s"$root/_log/_sidecars/$n")))
        .map(_.where("kind = 'file'").select(col("path"),
          coalesce(col("fsize"), lit(-1L)).as("f"),
          coalesce(col("mtime"), lit(-1L)).as("m")))
        .reduce(_ unionByName _)
      (1 to reps).foreach { i =>
        time(s"assembly-count#$i") { println("  rows=" + assembly.count()) }
      }
      (1 to reps).foreach { i =>
        time(s"assembly-packed-collect#$i") {
          val packed = assembly
            .as[(String, Long, Long)](
              org.apache.spark.sql.Encoders.product[(String, Long, Long)])
            .mapPartitions { it =>
              val bytes = new java.io.ByteArrayOutputStream()
              val offs = Array.newBuilder[Int]
              val fsz = Array.newBuilder[Long]
              val mts = Array.newBuilder[Long]
              var off = 0
              it.foreach { case (p, f, m) =>
                val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                bytes.write(b, 0, b.length); off += b.length
                offs += off; fsz += f; mts += m
              }
              Iterator.single((bytes.toByteArray, offs.result(), fsz.result(), mts.result()))
            }(org.apache.spark.sql.Encoders.product[
              (Array[Byte], Array[Int], Array[Long], Array[Long])])
            .collect()
          println("  blobs=" + packed.length +
            " rows=" + packed.map(_._2.length.toLong).sum)
        }
      }
    }
    if (refNames.nonEmpty) {
      // full-column union, select AFTER (the real assembly's shape):
      // does map-column pruning survive the union?
      def assemblyLate = (spark.read.parquet(pq.toString) +:
        refNames.map(n => spark.read.parquet(s"$root/_log/_sidecars/$n")))
        .map(_.where("kind = 'file'"))
        .reduce(_ unionByName _)
        .select(col("path"),
          coalesce(col("fsize"), lit(-1L)).as("f"),
          coalesce(col("mtime"), lit(-1L)).as("m"))
      (1 to reps).foreach { i =>
        time(s"late-select-count#$i") { println("  rows=" + assemblyLate.count()) }
      }
    }
    (1 to reps).foreach { i =>
      Snapshots.invalidateCaches(spark, root)
      time(s"versionFiles-cold#$i") {
        println("  files=" + Snapshots.versionFiles(spark, root, head).size)
      }
    }
    (1 to reps).foreach { i =>
      time(s"liveFileMeta-warm#$i") {
        println("  metas=" + Snapshots.liveFileMeta(spark, root, head).map(_.size))
      }
    }
    // the full plan-time listing (FileStatus synthesis included) — the
    // scan operator's actual wait; cold = caches dropped each rep
    (1 to reps).foreach { i =>
      Snapshots.invalidateCaches(spark, root)
      time(s"planFiles-cold#$i") {
        println("  planned=" + graft.sources.SnapshotPlanProbe.planFiles(spark, root, head))
      }
    }
    (1 to reps).foreach { i =>
      time(s"planFiles-warm#$i") {
        println("  planned=" + graft.sources.SnapshotPlanProbe.planFiles(spark, root, head))
      }
    }
    spark.stop()
  }
}
