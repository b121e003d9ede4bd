package graft.sources

import org.apache.spark.sql.SparkSession

/** Bench/diagnostic hook: drive the FileIndex front door exactly as a
  * query plan would — construct the index, list every partition
  * directory, count planned files — so the metadata harness
  * (`graft.MetaScale`) can time plan-time file-list construction
  * (`resolve` measures the log replay; THIS measures what the scan
  * operator actually waits for, `FileStatus` construction included). */
object SnapshotPlanProbe {
  def planFiles(spark: SparkSession, root: String, version: Long): Long = {
    val idx = new SnapshotFileIndex(spark, root, version, None)
    idx.listFiles(Nil, Nil).map(_.files.size.toLong).sum
  }
}
