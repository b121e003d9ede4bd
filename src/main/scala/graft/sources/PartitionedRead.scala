package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.core.HivePartitions

/** Shared machinery for reading EXPLICIT file lists of a Hive-partitioned
  * snapshot table through the native parquet scan path. Partition values
  * come from the file paths the log names (core/HivePartitions); each
  * distinct partition becomes one `PartitionDirectory` whose
  * `InternalRow` Catalyst uses to (a) evaluate partitionFilters at plan
  * time — files of non-matching partitions are never planned, the
  * partition-pruning contract — and (b) materialize the partition
  * columns without reading them from the files (they are not IN the
  * files; `partitionBy` writes them into the path). */
private[graft] object PartitionedRead {

  /** Group `statuses` into one `PartitionDirectory` per distinct
    * partition-values row, keeping only partitions every `partitionFilters`
    * conjunct accepts. Filters referencing columns outside the partition
    * schema (defensive — Catalyst should never send them) disable
    * pruning rather than mis-prune. */
  def partitionDirectories(
      statuses: Seq[FileStatus], partitionSchema: StructType,
      partitionFilters: Seq[Expression], timeZoneId: String): Seq[PartitionDirectory] = {
    if (partitionSchema.isEmpty)
      return Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
    // group by the PARENT-DIRECTORY substring (one lastIndexOf per
    // file), then parse + cast partition values once per DIRECTORY —
    // per-file parsing (path split + unescape + Cast allocation) was
    // seconds-to-minutes of driver time at 10⁵–10⁷ planned files.
    // Hive layout puts a partition's files under one directory, so
    // per-dir grouping is per-partition grouping (two dirs with equal
    // values yield two PartitionDirectories with equal rows — Spark
    // concatenates them, same plan).
    val names = partitionSchema.fieldNames.toSeq
    // group by dir substring of the rendered path (one URI render per
    // file — the checkpoint-metadata plan path avoids even that by
    // grouping its raw path strings via groupIndicesByDir directly)
    val idx = statuses.toIndexedSeq
    val byDir = groupIndicesByDir(idx.size, i => idx(i).getPath.toString)
    val keep = predicateOn(partitionFilters, partitionSchema)
    val out = Seq.newBuilder[PartitionDirectory]
    byDir.forEach { (dir, is) =>
      val row = HivePartitions.internalRowOfValues(
        HivePartitions.valuesOf(dir, names), partitionSchema, timeZoneId)
      if (keep(row)) out += PartitionDirectory(row, is.map(idx(_)))
    }
    out.result()
  }

  /** Group indices `[0, n)` by the parent-directory substring of
    * `pathOf(i)` — pure string work (one `lastIndexOf` per index, a
    * substring only when the directory CHANGES), no `Path`/URI
    * construction — fanned out over contiguous chunks and merged in
    * chunk order, so per-dir index order is preserved. This is the
    * grouping primitive the checkpoint-metadata plan path uses BEFORE
    * any `FileStatus` exists: at 10⁷ planned files, grouping the raw
    * checkpoint path strings costs tens of ms where grouping
    * `FileStatus.getPath.toString` (a fresh URI render per file) was
    * ~14 s of plan-time driver work. */
  def groupIndicesByDir(n: Int, pathOf: Int => String)
      : java.util.LinkedHashMap[String, Array[Int]] = {
    type Chunk = java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuilder.ofInt]
    val nChunks = math.max(1, math.min(64, n / 50000))
    val chunkMaps = new Array[Chunk](nChunks)
    java.util.stream.IntStream.range(0, nChunks).parallel().forEach { c =>
      val lo = (n.toLong * c / nChunks).toInt
      val hi = (n.toLong * (c + 1) / nChunks).toInt
      val m = new Chunk()
      // consecutive checkpoint rows are path-sorted, so the directory
      // repeats: reuse the previous substring when the prefix matches
      var lastDir: String = null
      var lastB: scala.collection.mutable.ArrayBuilder.ofInt = null
      var i = lo
      while (i < hi) {
        val p = pathOf(i)
        val cut = p.lastIndexOf('/')
        val sameDir = lastDir != null && cut == lastDir.length &&
          p.regionMatches(0, lastDir, 0, cut)
        if (!sameDir) {
          lastDir = if (cut <= 0) "" else p.substring(0, cut)
          lastB = m.get(lastDir)
          if (lastB == null) {
            lastB = new scala.collection.mutable.ArrayBuilder.ofInt()
            m.put(lastDir, lastB)
          }
        }
        lastB += i
        i += 1
      }
      chunkMaps(c) = m
    }
    val out = new java.util.LinkedHashMap[String, Array[Int]]()
    if (nChunks == 1) {
      chunkMaps(0).forEach((dir, b) => out.put(dir, b.result()))
      return out
    }
    val parts = new java.util.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Array[Int]]]()
    chunkMaps.foreach(_.forEach { (dir, b) =>
      var buf = parts.get(dir)
      if (buf == null) {
        buf = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
        parts.put(dir, buf)
      }
      buf += b.result()
    })
    parts.forEach { (dir, bufs) =>
      val total = bufs.iterator.map(_.length).sum
      val arr = new Array[Int](total)
      var off = 0
      bufs.foreach { a =>
        System.arraycopy(a, 0, arr, off, a.length); off += a.length
      }
      out.put(dir, arr)
    }
    out
  }

  /** Bind `filters` (conjuncts over partition columns) against
    * `partitionSchema` by attribute NAME and compile to an evaluable
    * predicate over partition-values rows. */
  private[sources] def predicateOn(
      filters: Seq[Expression], partitionSchema: StructType): InternalRow => Boolean = {
    if (filters.isEmpty) return _ => true
    val index = partitionSchema.fieldNames.zipWithIndex.toMap
    val bindable = filters.filter(_.references.forall(a => index.contains(a.name)))
    if (bindable.isEmpty) return _ => true
    val bound = bindable.map(_.transform {
      case a: Attribute if index.contains(a.name) =>
        val i = index(a.name)
        BoundReference(i, partitionSchema(i).dataType, nullable = true)
    }).reduce(And(_, _))
    val pred = Predicate.create(bound, Nil)
    pred.initialize(0)
    row => pred.eval(row)
  }

  /** An explicit file list of a (possibly partitioned) snapshot table as
    * a DataFrame in the LOGICAL column order of `fullSchema` — the read
    * primitive every log path that names files outright shares
    * (`readVersion`, COW rewrite reads, CDC insert synthesis, streaming
    * micro-batches). Unpartitioned tables take the plain multi-path
    * parquet read; partitioned tables plan a `HadoopFsRelation` over the
    * explicit list so partition columns come from the paths. */
  def frame(
      spark: SparkSession, qroot: Path, files: Seq[String],
      fullSchema: StructType, partCols: Seq[String],
      streaming: Boolean = false,
      nameMap: Map[String, String] = Map.empty): DataFrame = {
    val (dataSchema, partitionSchema) = HivePartitions.splitSchema(fullSchema, partCols)
    // column-mapped tables read through the translating format (the
    // files hold physical names); identity maps take the stock one
    val fmt =
      if (nameMap.forall { case (l, p) => l == p })
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      else new MappedParquetFileFormat(nameMap)
    val relation = HadoopFsRelation(
      new ExplicitPartitionedFileIndex(spark, qroot, files, partitionSchema),
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = fmt,
      options = Map.empty)(spark)
    val df = org.apache.spark.sql.classic.GraftSqlShim.ofRows(
      spark, LogicalRelation(relation, isStreaming = streaming))
    // relation output is dataSchema ++ partitionSchema; restore the
    // table's recorded logical order
    df.select(fullSchema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
  }
}

/** A `FileIndex` over an explicit, already-final file list with
  * partition awareness: statuses are stat-ed per NAMED file (the log
  * names exactly the files — no directory listing, so the cost is
  * O(files in this list) regardless of table size), and `listFiles`
  * groups them by path-encoded partition values, honoring
  * `partitionFilters`. */
private[graft] class ExplicitPartitionedFileIndex(
    spark: SparkSession, qroot: Path, files: Seq[String],
    override val partitionSchema: StructType) extends FileIndex {

  private lazy val statuses: Seq[FileStatus] = {
    val fs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one stat RPC per named file is unavoidable here (explicit lists
    // carry no recorded sizes) — but serial stats are an object-store
    // stall at 10⁴⁺ files, so they fan out (FileSystem is thread-safe)
    val sorted = files.distinct.sorted.toIndexedSeq
    val arr = new Array[FileStatus](sorted.size)
    java.util.stream.IntStream.range(0, sorted.size).parallel()
      .forEach(i => arr(i) = fs.getFileStatus(new Path(sorted(i))))
    scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
  }

  override def rootPaths: Seq[Path] = Seq(qroot)
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = () // committed files are immutable

  override def listFiles(
      partitionFilters: Seq[Expression], dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    PartitionedRead.partitionDirectories(statuses, partitionSchema, partitionFilters,
      spark.sessionState.conf.sessionLocalTimeZone)
}
