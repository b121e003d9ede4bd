package graft.core

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level min/max data skipping over parquet — the Delta/Iceberg
  * "statistics + file pruning" layer, over plain parquet files.
  *
  * A scan with a selective range predicate over a RANGE-CLUSTERED layout
  * (writer used `repartitionByRange(...).sortWithinPartitions(...)`, so
  * each file covers a narrow slice of the clustering key) only needs the
  * files whose [min,max] envelope intersects the predicate. Parquet
  * footers already carry per-row-group column statistics; the index here
  * is those stats rolled up to file grain, read METADATA-ONLY (a footer is
  * a few KB regardless of file size — no data pages are touched).
  *
  * 100 TB shape: statistics should be collected AT WRITE TIME into a
  * persistent index table (what a transaction log does); this post-hoc
  * builder is the backfill path. Work is O(files) tiny footer reads,
  * independent of data bytes — distribute it over executors (a
  * mapPartitions over the file list) when the file count is large; the
  * local driver loop here handles the thousands-of-files scale a test
  * table has. Pruning itself is O(index) — never O(data).
  *
  * Stats are kept for integral (INT32/INT64) leaf columns — the
  * clustering-key types; other columns simply aren't prunable here.
  */
object Skipping {

  /** One file's envelope: row count + per-column [min,max] for integral
    * columns (file grain = min of row-group mins, max of maxes). */
  final case class FileStats(path: String, rows: Long,
      mins: Map[String, Long], maxs: Map[String, Long])

  /** List the data files under `dir` (`_`-prefixed metadata files
    * excluded); `recursive` descends into partition directories. */
  def dataFiles(spark: SparkSession, dir: String, recursive: Boolean = false): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Seq[String] =
      fs.listStatus(d).toSeq.flatMap { s =>
        if (s.isFile && !s.getPath.getName.startsWith("_")) Seq(s.getPath.toString)
        else if (s.isDirectory && recursive) walk(s.getPath)
        else Nil
      }
    walk(p)
  }

  /** Roll each file's parquet footer statistics up to file grain. */
  def buildIndex(spark: SparkSession, dir: String, recursive: Boolean = false): Seq[FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    dataFiles(spark, dir, recursive).map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        var rows = 0L
        val mins = scala.collection.mutable.Map[String, Long]()
        val maxs = scala.collection.mutable.Map[String, Long]()
        blocks.forEach { b =>
          rows += b.getRowCount
          b.getColumns.forEach { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (st != null && st.hasNonNullValue) {
              val (lo, hi) = (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) => (Some(mn.longValue), Some(mx.longValue))
                case (mn: java.lang.Integer, mx: java.lang.Integer) => (Some(mn.longValue), Some(mx.longValue))
                case _ => (None, None)
              }
              for (l <- lo; h <- hi) {
                mins.update(name, math.min(mins.getOrElse(name, l), l))
                maxs.update(name, math.max(maxs.getOrElse(name, h), h))
              }
            }
          }
        }
        FileStats(f, rows, mins.toMap, maxs.toMap)
      } finally reader.close()
    }
  }

  /** Files whose [min,max] envelope on `col` intersects [lo, hi]. A file
    * with no stats for `col` cannot be skipped (must be kept). */
  def pruneFiles(index: Seq[FileStats], col: String, lo: Long, hi: Long): Seq[String] =
    index.filter { f =>
      (f.mins.get(col), f.maxs.get(col)) match {
        case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
        case _ => true
      }
    }.map(_.path)

  /** Index-pruned range scan: read only the surviving files, then apply
    * the exact predicate (stats pruning is a superset filter — the
    * predicate still runs, pushed to the parquet reader). */
  def scanPruned(spark: SparkSession, index: Seq[FileStats],
      colName: String, lo: Long, hi: Long): DataFrame = {
    val files = pruneFiles(index, colName, lo, hi)
    require(files.nonEmpty, s"no file can match $colName in [$lo,$hi]")
    spark.read.parquet(files: _*)
      .where(org.apache.spark.sql.functions.col(colName).between(lo, hi))
  }
}
