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
  def buildIndex(spark: SparkSession, dir: String, recursive: Boolean = false): Seq[FileStats] =
    buildIndexForFiles(spark, dataFiles(spark, dir, recursive))

  /** Index an explicit file list — the form a snapshot-logged table uses
    * (its manifest IS the file list; no directory involved). */
  def buildIndexForFiles(spark: SparkSession, files: Seq[String]): Seq[FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
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

  /** Persist an index as a parquet table (file, rows, col, min, max) —
    * the form a production deployment maintains NEXT TO the data (built
    * once at write time, consulted at planning time; re-reading footers
    * per query would be O(files) round trips from the driver). */
  def writeIndex(spark: SparkSession, index: Seq[FileStats], path: String): Unit = {
    import spark.implicits._
    index.flatMap { f =>
      if (f.mins.isEmpty) Seq((f.path, f.rows, null.asInstanceOf[String], 0L, 0L))
      else f.mins.keys.toSeq.map(c => (f.path, f.rows, c, f.mins(c), f.maxs(c)))
    }.toDF("file", "rows", "col", "min", "max")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted index back to the in-memory pruning form. */
  def readIndex(spark: SparkSession, path: String): Seq[FileStats] = {
    spark.read.parquet(path).collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case ((file, rows), rs) =>
        val cols = rs.filter(!_.isNullAt(2))
        FileStats(file, rows,
          cols.map(r => r.getString(2) -> r.getLong(3)).toMap,
          cols.map(r => r.getString(2) -> r.getLong(4)).toMap)
      }.toSeq
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

  /** Bloom-filter file pruning for STRING EQUALITY — the modality min/max
    * envelopes cannot serve: a point lookup on a high-cardinality key over
    * an UNCLUSTERED layout (every file's [min,max] spans the domain, so
    * stats prune nothing, but each file's parquet bloom answers "might
    * this file contain the value?" from the footer alone). Files whose
    * bloom excludes the value are skipped with certainty (blooms have no
    * false negatives); a missing bloom keeps the file. At 100 TB this is
    * the needle-in-haystack path: one key among billions touches the
    * O(1%) of files the bloom cannot rule out, metadata-only. Writers opt
    * in per column: `parquet.bloom.filter.enabled#<col>=true`. */
  def pruneFilesByBloomEquality(
      spark: SparkSession, dir: String, colName: String, value: String,
      recursive: Boolean = false): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    dataFiles(spark, dir, recursive).filter { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val blocks = reader.getFooter.getBlocks
        var mightContain = false
        blocks.forEach { b =>
          if (!mightContain) {
            var ccmd: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
            b.getColumns.forEach { c =>
              if (c.getPath.toDotString == colName) ccmd = c
            }
            if (ccmd == null) mightContain = true
            else {
              val bf = reader.getBloomFilterDataReader(b).readBloomFilter(ccmd)
              if (bf == null) mightContain = true
              else mightContain = bf.findHash(
                bf.hash(org.apache.parquet.io.api.Binary.fromString(value)))
            }
          }
        }
        mightContain
      } finally reader.close()
    }
  }

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
