package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-lifecycle maintenance for partitioned parquet: key-delete (the
  * GDPR/right-to-erasure path) and small-file compaction (OPTIMIZE).
  * Companions to `jobs.Merge` — same staging-swap write discipline, same
  * touched-partitions-only contract.
  *
  * Scale shapes (the 100 TB reasoning):
  *   - deleteKeys: locating which partitions hold the doomed keys needs one
  *     key semi-join against the full target (same unavoidable scan as
  *     Merge's move detection — without a transaction log or index there is
  *     no cheaper way to know where a key lives). The REWRITE, though, is
  *     confined to touched partitions: a delete of 10k users from a 5,000-
  *     partition table rewrites only the partitions that actually held
  *     them. When the caller already knows the partitions (key ->
  *     partition is functional), `knownPartitions` skips the full scan.
  *   - compactPartitions: a streaming/merge-heavy table accretes many small
  *     files per partition; at 100 TB the file count — not the byte count —
  *     kills scan planning (footer reads, scheduler overhead, no
  *     whole-stage batching). Compaction lists file sizes from the
  *     FileSystem (metadata-only, no data read), picks only partitions
  *     whose file count exceeds what their bytes justify, and rewrites
  *     JUST those with ceil(bytes/targetFileBytes) output files each.
  *     Untouched partitions keep their files byte-identical.
  */
object Lifecycle {

  /** Delete all rows of the partitioned table at `targetPath` whose key
    * matches a row of `keys`. Rewrites only partitions that held a doomed
    * key; a partition whose every row is deleted has its directory removed
    * (dynamic overwrite cannot, since the partition is absent from the
    * output — the same edge Merge handles). Returns the post-delete table
    * and the touched partition tuples. */
  def deleteKeys(
      spark: SparkSession,
      targetPath: String,
      keys: DataFrame,
      keyCols: Seq[String],
      partitionCols: Seq[String],
      stagingPath: String,
      knownPartitions: Option[Seq[Seq[Any]]] = None
  ): (DataFrame, Seq[Seq[Any]]) = {
    require(keyCols.nonEmpty && partitionCols.nonEmpty &&
      keyCols.intersect(partitionCols).isEmpty,
      "keyCols must be non-empty and disjoint from the partition columns")
    val target = spark.read.parquet(targetPath)
    val keySet = keys.select(keyCols.map(col): _*).dropDuplicates(keyCols)
    val pCols = partitionCols.map(col)
    val touched: Seq[Seq[Any]] = knownPartitions.getOrElse {
      target.join(keySet, keyCols, "left_semi")
        .select(pCols: _*).distinct().collect()
        .map(r => partitionCols.indices.map(r.get).toList).toSeq
    }
    if (touched.isEmpty) return (target, Nil)

    val prunePred = touched.map { tuple =>
      partitionCols.zip(tuple).map { case (c, v) => col(c) === lit(v) }
        .reduce(_ && _)
    }.reduce(_ || _)
    // kept-side anti join runs over the PRUNED slice only
    val kept = target.where(prunePred).join(keySet, keyCols, "left_anti")
    kept.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(stagingPath)
    // explicit schema: when every row of every touched partition died the
    // staging dir has no files and schema inference would fail
    val staged = spark.read.schema(target.schema).parquet(stagingPath)
    staged.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(targetPath)
    val remaining = staged
      .select(pCols: _*).distinct().collect()
      .map(r => partitionCols.indices.map(r.get).toList: Seq[Any]).toSet
    Merge.deletePartitionDirs(spark, targetPath, partitionCols,
      touched.map(_.toList: Seq[Any]).filterNot(remaining.contains))
    (spark.read.parquet(targetPath), touched)
  }

  /** One partition's on-disk footprint, from a metadata-only listing. */
  final case class PartitionFiles(values: Seq[String], files: Int, bytes: Long)

  /** List each leaf partition's data-file count and byte size under `path`
    * (partition values parsed from the `k=v` directory names, in
    * `partitionCols` order). FileSystem metadata only — no data is read. */
  def listPartitionFiles(
      spark: SparkSession, path: String, partitionCols: Seq[String]): Seq[PartitionFiles] = {
    val unqualified = new org.apache.hadoop.fs.Path(path)
    val fs = unqualified.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // listStatus returns scheme-qualified child paths; the relative-path
    // parse below must strip an equally-qualified root
    val root = fs.makeQualified(unqualified)
    def leaves(p: org.apache.hadoop.fs.Path, depth: Int): Seq[org.apache.hadoop.fs.Path] =
      if (depth == partitionCols.length) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith(partitionCols(depth) + "="))
        .flatMap(s => leaves(s.getPath, depth + 1))
    leaves(root, 0).map { leaf =>
      val rel = leaf.toString.stripPrefix(root.toString).stripPrefix("/")
      val values = rel.split("/").toSeq.map { seg =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.substring(seg.indexOf('=') + 1))
      }
      val datafiles = fs.listStatus(leaf).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      PartitionFiles(values, datafiles.size, datafiles.map(_.getLen).sum)
    }
  }

  /** Compact partitions whose file count exceeds ceil(bytes/targetFileBytes)
    * down to exactly that many files, leaving every other partition's files
    * untouched on disk. Returns (partitions compacted, files before, files
    * after) over the compacted set. */
  def compactPartitions(
      spark: SparkSession,
      targetPath: String,
      partitionCols: Seq[String],
      targetFileBytes: Long,
      stagingPath: String
  ): (Int, Int, Int) = {
    val all = listPartitionFiles(spark, targetPath, partitionCols)
    def desired(bytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val todo = all.filter(p => p.files > desired(p.bytes))
    if (todo.isEmpty) return (0, 0, 0)

    // directory names spell null as __HIVE_DEFAULT_PARTITION__; matching
    // must be null-safe (<=>) or the null partition silently never matches
    // and stays fragmented while being counted as compacted
    def pv(v: String): String =
      if (v == "__HIVE_DEFAULT_PARTITION__") null else v
    def eqPv(c: String, v: String): org.apache.spark.sql.Column = {
      val mapped = pv(v)
      if (mapped == null) col(c).isNull else col(c) === lit(mapped)
    }
    val prunePred = todo.map { p =>
      partitionCols.zip(p.values).map { case (c, v) => eqPv(c, v) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val slice = spark.read.parquet(targetPath).where(prunePred)
    // route each partition's rows into exactly `desired` writer tasks: a
    // per-partition file budget looked up from a broadcast map, then a
    // repartition on (partition cols, bucket). Content placement within a
    // partition is arbitrary (parquet has no intra-file order contract);
    // the row SET per partition is preserved exactly.
    val budgets = todo.map(p => p.values -> desired(p.bytes)).toMap
    val budgetDf = spark.createDataFrame(
      budgets.toSeq.map { case (vs, n) => org.apache.spark.sql.Row.fromSeq(vs.map(pv) :+ n) }
        .asJava,
      org.apache.spark.sql.types.StructType(
        partitionCols.map(c => org.apache.spark.sql.types.StructField(
          s"__pv_$c", org.apache.spark.sql.types.StringType)) :+
          org.apache.spark.sql.types.StructField("__nfiles",
            org.apache.spark.sql.types.IntegerType)))
    val joinCond = partitionCols.map(c =>
      col(c).cast("string") <=> col(s"__pv_$c")).reduce(_ && _)
    val joined = slice.join(broadcast(budgetDf), joinCond, "left")
    // a partition value whose string cast round-trips differently from its
    // escaped dir-name parse would silently drop on an inner join — left
    // join + one counting pass turns the mismatch into a loud failure
    val chk = joined.agg(
      count(lit(1)).as("total"), count(col("__nfiles")).as("matched")).head()
    require(chk.getLong(0) == chk.getLong(1),
      s"compaction partition-value mismatch: ${chk.getLong(0)} rows in " +
        s"fragmented partitions but only ${chk.getLong(1)} matched a budget " +
        s"— dir-name parse vs column value disagree for some partition")
    val bucketed = joined
      .withColumn("__bucket", pmod(spark_partition_id() + monotonically_increasing_id(),
        col("__nfiles").cast("long")))
    val nShuffle = math.max(budgets.values.sum, 1)
    bucketed
      .repartition(nShuffle, partitionCols.map(col) :+ col("__bucket"): _*)
      .drop((partitionCols.map(c => s"__pv_$c") ++ Seq("__nfiles", "__bucket")): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(stagingPath)
    spark.read.parquet(stagingPath).write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(targetPath)
    val after = listPartitionFiles(spark, targetPath, partitionCols)
      .filter(p => budgets.contains(p.values))
    (todo.size, todo.map(_.files).sum, after.map(_.files).sum)
  }

  /** Partition-level retention (TTL): drop every partition whose value
    * tuple matches `expire` — a pure directory delete, NO data is read or
    * rewritten. This is why time-partitioned tables put the retention key
    * in the partitioning: expiring 90-day-old data from a 5,000-partition
    * table is 90 metadata operations, while the same policy as a row
    * filter (`deleteKeys`) would rewrite every file it touches. Returns
    * the dropped partition tuples. */
  def expirePartitions(
      spark: SparkSession,
      targetPath: String,
      partitionCols: Seq[String],
      expire: Seq[String] => Boolean
  ): Seq[Seq[String]] = {
    val doomed = listPartitionFiles(spark, targetPath, partitionCols)
      .map(_.values).filter(expire)
    Merge.deletePartitionDirs(spark, targetPath, partitionCols,
      doomed.map(_.toList: Seq[Any]))
    doomed
  }

  /** Remove writer debris under `path`: `_temporary` directories (left by
    * crashed or killed jobs — the committer only cleans them on success)
    * and orphaned `.*.tmp` in-progress files. Committed data, partition
    * dirs and `_SUCCESS` markers are untouched. Returns the number of
    * entries deleted.
    *
    * At 100 TB debris is not cosmetic: a `_temporary` tree from a crashed
    * writer can hold a full copy of the job's output, and some listers
    * (schema inference, naive globs) trip over it. Vacuum is metadata-only
    * work, O(directory entries). */
  def vacuumOrphans(spark: SparkSession, path: String): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var deleted = 0
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { s =>
        val name = s.getPath.getName
        if (s.isDirectory && name == "_temporary") {
          fs.delete(s.getPath, true); deleted += 1
        } else if (s.isFile && name.startsWith(".") && name.endsWith(".tmp")) {
          fs.delete(s.getPath, false); deleted += 1
        } else if (s.isDirectory) walk(s.getPath)
      }
    walk(root)
    deleted
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add); l
    }
  }
}
