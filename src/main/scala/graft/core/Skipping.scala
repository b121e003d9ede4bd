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

  /** One column chunk's contribution to a file envelope: `covered` means
    * the chunk RECORDED statistics (an all-null chunk counts — it cannot
    * contribute a non-null value, so the other blocks' envelope stays
    * valid for it); min/max are set only for integral chunks with values. */
  private[core] final case class ChunkStat(
      col: String, covered: Boolean, min: Option[Long], max: Option[Long])

  /** Roll per-block chunk stats up to a file envelope. A column whose
    * stats are MISSING in any block that has rows must be dropped
    * entirely: keeping the partial envelope would under-cover (the
    * stats-less block may hold values outside it) and `pruneFiles` would
    * incorrectly skip a file holding matching rows. */
  private[core] def rollUpEnvelope(
      blocks: Seq[Seq[ChunkStat]]): (Map[String, Long], Map[String, Long]) = {
    val mins = scala.collection.mutable.Map[String, Long]()
    val maxs = scala.collection.mutable.Map[String, Long]()
    val tainted = scala.collection.mutable.Set[String]()
    blocks.foreach(_.foreach { c =>
      if (!c.covered) tainted += c.col
      for (l <- c.min) mins.update(c.col, math.min(mins.getOrElse(c.col, l), l))
      for (h <- c.max) maxs.update(c.col, math.max(maxs.getOrElse(c.col, h), h))
    })
    ((mins -- tainted).toMap, (maxs -- tainted).toMap)
  }

  /** Index an explicit file list — the form a snapshot-logged table uses
    * (its manifest IS the file list; no directory involved). */
  def buildIndexForFiles(spark: SparkSession, files: Seq[String]): Seq[FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.map(f => statsOfFile(conf, f))
  }

  /** An INT64 timestamp chunk's envelope enters ONLY for MICROS
    * annotations: a Timestamp literal translates to epoch micros
    * (sources/SnapshotFilters), so an envelope in any other UNIT
    * (millis, nanos) would mis-prune. Excluded units stay
    * covered-but-valueless — unprunable, always sound. INT96 timestamps
    * (Spark's default) record no stats at all and land in the same
    * bucket. isAdjustedToUTC does NOT gate admission: the engine reads
    * parquet with `inferTimestampNTZ.enabled=false`
    * (Tables.ensureTimestampCompat), so local-semantics micros are
    * interpreted as the same raw epoch micros the envelope records —
    * literal and stats compare in one unit space either way. */
  private def timestampEnvelopeSafe(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean =
    c.getPrimitiveType.getLogicalTypeAnnotation match {
      case t: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit == org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS
      case _ => true // not a timestamp: raw integral semantics
    }

  /** One file's footer → FileStats (metadata-only; runs wherever the
    * caller is — see `buildIndexDistributed` for the executor form). */
  private def statsOfFile(
      conf: org.apache.hadoop.conf.Configuration, f: String): FileStats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
    try {
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      val chunkStats = scala.collection.mutable.ArrayBuffer[Seq[ChunkStat]]()
      blocks.forEach { b =>
        rows += b.getRowCount
        if (b.getRowCount > 0) {
          val cs = scala.collection.mutable.ArrayBuffer[ChunkStat]()
          b.getColumns.forEach { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (st == null || st.isEmpty) cs += ChunkStat(name, covered = false, None, None)
            else if (!st.hasNonNullValue) cs += ChunkStat(name, covered = true, None, None)
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) if timestampEnvelopeSafe(c) =>
                cs += ChunkStat(name, covered = true, Some(mn.longValue), Some(mx.longValue))
              case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                cs += ChunkStat(name, covered = true, Some(mn.longValue), Some(mx.longValue))
              case _ => // non-integral or unit-unsafe: stays unprunable
                cs += ChunkStat(name, covered = true, None, None)
            }
          }
          chunkStats += cs.toSeq
        }
      }
      val (mins, maxs) = rollUpEnvelope(chunkStats.toSeq)
      FileStats(f, rows, mins, maxs)
    } finally reader.close()
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
    dataFiles(spark, dir, recursive).filter(f => bloomMightContain(conf, f, colName, value))
  }

  /** One file's bloom verdict for `col = value` — footer + bloom pages
    * only, no data pages. Runs wherever the caller is. */
  private def bloomMightContain(
      conf: org.apache.hadoop.conf.Configuration,
      f: String, colName: String, value: String): Boolean = {
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

  /** Hadoop conf as a broadcastable property list (Configuration itself
    * is not serializable); executors rebuild it with defaults loaded so
    * filesystem bindings resolve. */
  private def confProps(conf: org.apache.hadoop.conf.Configuration): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    conf.iterator().forEachRemaining(e => out += (e.getKey -> e.getValue))
    out.toSeq
  }

  private def confOf(props: Seq[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** EXECUTOR-DISTRIBUTED bloom pruning over an explicit file list (the
    * snapshot-manifest form): the per-file footer+bloom probes fan out as
    * a `mapPartitions` over the file list, so a point lookup on a
    * 10⁵–10⁶-file table costs O(files / executors) wall-clock instead of
    * a driver-serial footer loop — the scale gap the driver-side
    * `pruneFilesByBloomEquality` has. Identical pruning by construction
    * (same per-file probe; SkippingSpec pins the equivalence). */
  def pruneFilesByBloomEqualityDistributed(
      spark: SparkSession, files: Seq[String], colName: String, value: String): Seq[String] = {
    import spark.implicits._
    val props = spark.sparkContext.broadcast(confProps(spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism, files.size))
    spark.createDataset(files).repartition(slices)
      .mapPartitions { fs =>
        val conf = confOf(props.value)
        fs.filter(f => bloomMightContain(conf, f, colName, value))
      }
      .collect().toSeq.sorted
  }

  /** EXECUTOR-DISTRIBUTED footer-stats index build over an explicit file
    * list — the backfill path at real file counts (the driver loop in
    * `buildIndexForFiles` is the small-table form). */
  def buildIndexDistributed(spark: SparkSession, files: Seq[String]): Seq[FileStats] = {
    import spark.implicits._
    val props = spark.sparkContext.broadcast(confProps(spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism, files.size))
    spark.createDataset(files).repartition(slices)
      .mapPartitions { fs =>
        val conf = confOf(props.value)
        fs.map(f => statsOfFile(conf, f))
      }
      .collect().toSeq.sortBy(_.path)
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
