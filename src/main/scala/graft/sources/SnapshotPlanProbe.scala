package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, LessThanOrEqual, Literal}
import org.apache.spark.sql.types.LongType

/** Bench/diagnostic hooks: drive the FileIndex front door exactly as a
  * query plan would — construct the index, list partition directories,
  * count planned files — so the metadata harness (`graft.MetaScale`)
  * can time plan-time file-list construction (`resolve` measures the
  * log replay; THESE measure what the scan operator actually waits
  * for, `FileStatus` construction included). */
object SnapshotPlanProbe {

  /** Full-scan plan: every live file's `FileStatus` is constructed —
    * inherently O(files) (the scan must enumerate its splits). */
  def planFiles(spark: SparkSession, root: String, version: Long,
      bloomOn: Option[String] = None): Long = {
    val idx = new SnapshotFileIndex(spark, root, version, bloomOn)
    idx.listFiles(Nil, Nil).map(_.files.size.toLong).sum
  }

  /** What the OPTIMIZER waits for before any file is listed:
    * `sizeInBytes` (asked on every query for join sizing) — O(tail
    * change) from the checkpoint's aggr header, never the full list. */
  def planSize(spark: SparkSession, root: String, version: Long,
      bloomOn: Option[String] = None): Long = {
    val idx = new SnapshotFileIndex(spark, root, version, bloomOn)
    idx.sizeInBytes
  }

  /** A SELECTIVE scan's plan-time file listing: `lo <= column <= hi`
    * as resolved catalyst data filters, exactly what Spark hands
    * `listFiles` — the stats prune runs distributed and only the
    * survivors' `FileStatus`es are ever constructed. */
  def planSelective(
      spark: SparkSession, root: String, version: Long,
      column: String, lo: Long, hi: Long,
      bloomOn: Option[String] = None): Long = {
    val idx = new SnapshotFileIndex(spark, root, version, bloomOn)
    val a = AttributeReference(column, LongType)()
    val filters = Seq(
      GreaterThanOrEqual(a, Literal(lo)), LessThanOrEqual(a, Literal(hi)))
    idx.listFiles(Nil, filters).map(_.files.size.toLong).sum
  }
}
