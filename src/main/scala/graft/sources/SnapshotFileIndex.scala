package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.jobs.Snapshots

/** The snapshot log as a Spark `FileIndex` — the integration point a
  * table format plugs into so the NATIVE parquet scan path (vectorized
  * reader, whole-stage codegen, row-group pushdown) plans over the
  * log's explicit file list with file-level stats pruning applied at
  * `listFiles` time. This replaces the earlier DSv1 `PrunedFilteredScan`
  * bridge, which forced every row through an RDD[Row] conversion — at
  * 100 TB the per-row bridge tax and the lost vectorization dominate;
  * with a FileIndex the front door plans the same `FileSourceScanExec`
  * a plain `spark.read.parquet` gets, minus the files the stats rule
  * out.
  *
  * Pruning inputs are catalyst `dataFilters`, whose literals are already
  * in internal form — DateType days, TimestampType epoch micros — i.e.
  * exactly the units the stats envelopes carry (core/Skipping admits
  * timestamp envelopes only for MICROS-adjusted-to-UTC chunks, so a
  * micros bound can never mis-prune). `bloomOn` additionally probes
  * per-file parquet blooms for string equality (executor-distributed).
  *
  * File statuses are listed once per index instance, one `listStatus`
  * per COMMIT DIRECTORY (not per file) — O(commit dirs) metadata RPCs;
  * the stats index itself is cached per immutable (root, version) in
  * `Snapshots.statsIndex`. */
private[sources] class SnapshotFileIndex(
    spark: SparkSession, val root: String, val version: Long, bloomOn: Option[String])
  extends FileIndex {

  private val qroot: Path = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
  }

  /** Qualified table root — the DV rule resolves sidecar paths from it. */
  private[sources] def tableRoot: Path = qroot

  /** The version's LIVE deletion-vector directories (empty on tables
    * never MOR-deleted) — `DeletionVectorsRule` rewrites scans of
    * DV-carrying versions into scan ⟕̸ sidecar anti-joins. */
  private[sources] lazy val dvDirs: Seq[String] =
    Snapshots.liveDeletionVectors(spark, root, version)

  /** The version's full live list as metadata rows — parquet-checkpoint
    * tables answer from the checkpoint's recorded (size, mtime) with
    * ZERO filesystem RPCs; None keeps the listing path. */
  private lazy val liveMetas: Option[Seq[Snapshots.LiveFileMeta]] =
    Snapshots.liveFileMeta(spark, root, version)

  /** One plan-time `FileStatus`, synthesized from a checkpoint row when
    * it carries the full (length, mtime) pair (files are immutable once
    * committed, so the recorded length is exact — the parquet reader
    * seeks the footer by it; the mtime keeps (path, mtime)-keyed caches
    * honest). A legacy row missing EITHER field pays a single stat RPC —
    * the pair is recorded together, so a half-present row only descends
    * from hand-edited logs. Note the stat is intentionally LOUD: a
    * vacuum-raced missing file fails here at plan time, where the old
    * listing path silently dropped it — planning a version whose files
    * are gone should never quietly return partial data. */
  private def statusOf(
      m: Snapshots.LiveFileMeta,
      fs: org.apache.hadoop.fs.FileSystem): FileStatus = {
    val p = new Path(qroot, m.path)
    if (m.sized) new FileStatus(m.fsize, false, 1, 128L * 1024 * 1024, m.mtime, p)
    else fs.getFileStatus(p)
  }

  private lazy val statuses: Seq[FileStatus] = liveMetas match {
    case Some(metas) =>
      val fs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Path construction is ~2.5 µs of URI parsing per file — at 10⁷
      // planned files a sequential map is tens of seconds of driver
      // time, so the FileStatus array builds on every core (statusOf
      // is side-effect-free; the legacy stat fallback is thread-safe)
      val arr = new Array[FileStatus](metas.size)
      val seq = metas.toIndexedSeq
      java.util.stream.IntStream.range(0, arr.length).parallel()
        .forEach(i => arr(i) = statusOf(seq(i), fs))
      scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
    case None =>
      val fs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = Snapshots.versionFiles(spark, root, version).toSet
      files.map(f => new Path(f).getParent).toSeq.distinct
        .flatMap(dir => fs.listStatus(dir).toSeq)
        .filter(s => s.isFile && files.contains(s.getPath.toString))
  }

  /** Hive-partitioned tables (the `graft.partitionBy` property) expose
    * their REAL partition schema, so Catalyst routes partition-column
    * predicates in as `partitionFilters` and `listFiles` prunes whole
    * partitions from the path-encoded values — zero data and zero stats
    * reads for the dominant pruning dimension. */
  private lazy val partCols: Seq[String] =
    graft.core.HivePartitions.columnsOf(
      Snapshots.tableProperties(spark, root, version))

  private lazy val schemas: (StructType, StructType) =
    graft.core.HivePartitions.splitSchema(
      Snapshots.versionSchema(spark, root, version).getOrElse(StructType(Nil)),
      partCols)

  private[sources] def dataSchema: StructType = schemas._1

  override def rootPaths: Seq[Path] = Seq(qroot)
  override def partitionSchema: StructType = schemas._2

  /** The optimizer asks for the table's byte size on EVERY query (join
    * sizing, broadcast decisions) — answered O(tail change) from the
    * checkpoint's `aggr` header, so planning a selective scan of a
    * 10⁸-file table never materializes the per-file list at all; the
    * per-file sum survives only as the legacy fallback (pre-aggr
    * checkpoints, text-codec tables). */
  override def sizeInBytes: Long =
    Snapshots.liveAggregate(spark, root, version).map(_._2)
      .getOrElse(statuses.map(_.getLen).sum)

  override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = () // versions are immutable

  /** String equalities on the bloom column in one conjunct. */
  private def bloomValues(e: Expression, c: String): Seq[String] = e match {
    case EqualTo(a: Attribute, Literal(v: UTF8String, _)) if a.name == c => Seq(v.toString)
    case EqualTo(Literal(v: UTF8String, _), a: Attribute) if a.name == c => Seq(v.toString)
    case And(l, r) => bloomValues(l, c) ++ bloomValues(r, c)
    case _ => Nil
  }

  /** The physical-name translation the stats/bloom machinery needs —
    * filters speak logical names (identity on never-renamed tables). */
  private def phys(c: String): String = {
    lazy val physMap = Snapshots.versionSchema(spark, root, version)
      .map(Snapshots.physicalMap).getOrElse(Map.empty[String, String])
    physMap.getOrElse(c, c)
  }

  /** The four envelope-bound families implied by `dataFilters`, keyed
    * by PHYSICAL names. None = some family is provably empty (the scan
    * can plan zero files). */
  private def boundsOf(dataFilters: Seq[Expression])
      : Option[(Map[String, (Long, Long)], Map[String, (Double, Double)],
        Map[String, graft.core.Skipping.StrRange], Map[String, Set[Boolean]])] = {
    val bs = dataFilters.map(StatsBounds.bounds)
      .foldLeft(Map.empty[String, (Long, Long)])(StatsBounds.intersect)
      .map { case (c, r) => phys(c) -> r }
    val dbs = dataFilters.map(StatsBounds.dblBounds)
      .foldLeft(Map.empty[String, (Double, Double)])(StatsBounds.dblIntersect)
      .map { case (c, r) => phys(c) -> r }
    val sbs = dataFilters.map(StatsBounds.strBounds)
      .foldLeft(Map.empty[String, graft.core.Skipping.StrRange])(StatsBounds.strIntersect)
      .map { case (c, r) => phys(c) -> r }
    val nbs = dataFilters.map(StatsBounds.nullBounds)
      .foldLeft(Map.empty[String, Set[Boolean]])(StatsBounds.nullIntersect)
      .map { case (c, r) => phys(c) -> r }
    if (bs.exists { case (_, (lo, hi)) => lo > hi }) return None
    if (dbs.exists { case (_, (lo, hi)) => lo > hi }) return None
    if (sbs.exists(_._2.isEmpty)) return None
    if (nbs.exists(_._2.size == 2)) return None
    Some((bs, dbs, sbs, nbs))
  }

  /** The version's `FileStatus`es surviving stats (and bloom) pruning
    * for the given filters — what `listFiles` plans. On parquet-
    * checkpoint tables the envelope filter runs on the EXECUTORS and
    * only the surviving (path, size, mtime) rows reach the driver; the
    * full status list is never materialized for a selective scan. */
  private def survivingStatuses(dataFilters: Seq[Expression]): Seq[FileStatus] = {
    val statsPruned: Seq[FileStatus] = boundsOf(dataFilters) match {
      case None => Nil // some conjunct is provably unsatisfiable
      case Some((bs, dbs, sbs, nbs)) =>
        if (bs.isEmpty && dbs.isEmpty && sbs.isEmpty && nbs.isEmpty) statuses
        else Snapshots.distributedCandidateMeta(
            spark, root, version, bs, dbs, sbs, nbs) match {
          case Some(metas) =>
            val fs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
            metas.map(statusOf(_, fs))
          case None =>
            val all = statuses.map(_.getPath.toString)
            val idx = Snapshots.statsIndex(spark, root, version)
            def fold[A](files: Seq[String], m: Map[String, A])(
                prune: (Seq[graft.core.Skipping.FileStats], String, A) => Seq[String]): Seq[String] =
              m.foldLeft(files) { case (fs, (c, r)) =>
                val fileSet = fs.toSet // O(files) member tests, not O(files²)
                val keep = prune(idx.filter(s => fileSet.contains(s.path)), c, r).toSet
                fs.filter(keep.contains)
              }
            val afterLong = fold(all, bs)((i, c, r) =>
              graft.core.Skipping.pruneFiles(i, c, r._1, r._2))
            val afterDbl = fold(afterLong, dbs)((i, c, r) =>
              graft.core.Skipping.pruneFilesDouble(i, c, r._1, r._2))
            val afterStr = fold(afterDbl, sbs)((i, c, r) =>
              graft.core.Skipping.pruneFilesString(i, c, r))
            val keep = fold(afterStr, nbs)((i, c, r) =>
              graft.core.Skipping.pruneFilesNull(i, c, r.head)).toSet
            statuses.filter(s => keep.contains(s.getPath.toString))
        }
    }
    bloomOn match {
      case Some(c) =>
        val values = dataFilters.flatMap(bloomValues(_, c)).distinct
        values.foldLeft(statsPruned) { (sts, v) =>
          if (sts.isEmpty) sts
          else {
            val keep = graft.core.Skipping.pruneFilesByBloomEqualityDistributed(
              spark, sts.map(_.getPath.toString), phys(c), v).toSet
            sts.filter(s => keep.contains(s.getPath.toString))
          }
        }
      case None => statsPruned
    }
  }

  /** The version's files surviving stats (and bloom) pruning for the
    * given filters — exposed for the spec to pin the PLANNED set. */
  private[sources] def survivingPaths(dataFilters: Seq[Expression]): Set[String] =
    survivingStatuses(dataFilters).map(_.getPath.toString).toSet

  /** Partition directories straight from checkpoint METADATA rows —
    * the partitioned-table plan path. Grouping runs on the raw relative
    * path strings (no `Path`/URI per file — at 10⁷ files the
    * per-file `Path.toString` render alone was ~14 s of plan time),
    * partition values parse + cast once per DIRECTORY, and
    * `FileStatus`es are synthesized only for the files of partitions
    * the filters KEEP — a pruned partition never pays even the `Path`
    * constructor. Construction is one flat parallel loop over the kept
    * files (balanced regardless of how many files share a directory).
    * `bloomOn` tables probe parquet blooms AFTER partition pruning, on
    * the survivors' already-rendered statuses only (r18 VERDICT task 4
    * — the old path bailed to the full status list, paying the per-file
    * render for partitions the filters were about to discard). */
  private def directoriesOfMetas(
      metas: Seq[Snapshots.LiveFileMeta],
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val fs = qroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = metas.toIndexedSeq
    val names = partitionSchema.fieldNames.toSeq
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val byDir = PartitionedRead.groupIndicesByDir(idx.size, i => idx(i).path)
    val keep = PartitionedRead.predicateOn(partitionFilters, partitionSchema)
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val groups = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    byDir.forEach { (dir, is) =>
      val row = graft.core.HivePartitions.internalRowOfValues(
        graft.core.HivePartitions.valuesOf(dir, names), partitionSchema, tz)
      if (keep(row)) { rows += row; groups += is }
    }
    // one flat parallel loop over ALL kept files: group boundaries via
    // binary search on the prefix sums, statuses land in per-group
    // arrays directly
    val starts = groups.scanLeft(0)(_ + _.length).toArray
    val arrs = groups.map(g => new Array[FileStatus](g.length))
    java.util.stream.IntStream.range(0, starts.last).parallel().forEach { j =>
      val p = java.util.Arrays.binarySearch(starts, j)
      val g = if (p >= 0) p else -p - 2
      val li = j - starts(g)
      arrs(g)(li) = statusOf(idx(groups(g)(li)), fs)
    }
    // bloom probes run last, over partition+stats survivors only — the
    // one stage that needs rendered path strings pays them for exactly
    // the files that could still be planned
    val bloomed: collection.Seq[Array[FileStatus]] = bloomOn match {
      case Some(c) =>
        val values = dataFilters.flatMap(bloomValues(_, c)).distinct
        if (values.isEmpty) arrs
        else {
          val all = arrs.iterator.flatMap(_.iterator.map(_.getPath.toString)).toSeq
          val keep = values.foldLeft(all) { (ps, v) =>
            if (ps.isEmpty) ps
            else graft.core.Skipping.pruneFilesByBloomEqualityDistributed(
              spark, ps, phys(c), v)
          }.toSet
          arrs.map(_.filter(s => keep.contains(s.getPath.toString)))
        }
      case None => arrs
    }
    rows.indices.map(g => PartitionDirectory(rows(g), bloomed(g)))
      .filter(_.files.nonEmpty)
  }

  override def listFiles(
      partitionFilters: Seq[Expression], dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // partitioned metadata tables group + prune on the checkpoint rows
    // BEFORE any FileStatus exists (bloom probes, the one stage that
    // needs rendered paths, run inside directoriesOfMetas on partition
    // survivors only)
    if (partitionSchema.nonEmpty) {
      boundsOf(dataFilters) match {
        case None => return Nil // some conjunct is provably unsatisfiable
        case Some((bs, dbs, sbs, nbs)) =>
          val metas =
            if (bs.isEmpty && dbs.isEmpty && sbs.isEmpty && nbs.isEmpty)
              liveMetas
            else Snapshots.distributedCandidateMeta(
              spark, root, version, bs, dbs, sbs, nbs)
          metas match {
            case Some(ms) => return directoriesOfMetas(ms, partitionFilters, dataFilters)
            case None => () // text codec / fallback: status-list path below
          }
      }
    }
    PartitionedRead.partitionDirectories(
      survivingStatuses(dataFilters),
      partitionSchema, partitionFilters,
      spark.sessionState.conf.sessionLocalTimeZone)
  }
}

/** Integral-bounds extraction from predicate conjuncts — the shared
  * envelope math behind BOTH plan-time file pruning (SnapshotFileIndex,
  * on resolved catalyst filters whose literals are internal
  * days/micros) and commit-time candidate selection for predicate COW
  * rewrites (`Snapshots.deleteWhere`/`updateWhere`, on PARSED predicates
  * whose attribute nodes are unresolved — both shapes are `Attribute`s,
  * so one matcher serves). Always an OVER-approximation: a column the
  * matcher can't bound simply yields no constraint (sound — the exact
  * predicate still runs in the scan / the rewrite). */
private[graft] object StatsBounds {

  /** Closed [lo, hi] bounds per column implied by one conjunct. An
    * empty range (lo > hi) encodes "provably no row". */
  def bounds(e: Expression): Map[String, (Long, Long)] = {
    def lit(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case d: java.math.BigDecimal if d.scale == 0 => scala.util.Try(d.longValueExact).toOption
      case d: org.apache.spark.sql.types.Decimal if d.scale == 0 => scala.util.Try(d.toLong).toOption
      case _ => None
    }
    def range(a: String, lo: Long, hi: Long) = Map(a -> (lo, hi))
    e match {
      case EqualTo(a: Attribute, Literal(v, _)) => lit(v).map(l => range(a.name, l, l)).getOrElse(Map.empty)
      case EqualTo(Literal(v, _), a: Attribute) => lit(v).map(l => range(a.name, l, l)).getOrElse(Map.empty)
      case GreaterThan(a: Attribute, Literal(v, _)) =>
        lit(v).map(l => if (l < Long.MaxValue) range(a.name, l + 1, Long.MaxValue) else range(a.name, 1L, 0L)).getOrElse(Map.empty)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
        lit(v).map(l => range(a.name, l, Long.MaxValue)).getOrElse(Map.empty)
      case LessThan(a: Attribute, Literal(v, _)) =>
        lit(v).map(l => if (l > Long.MinValue) range(a.name, Long.MinValue, l - 1) else range(a.name, 1L, 0L)).getOrElse(Map.empty)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
        lit(v).map(l => range(a.name, Long.MinValue, l)).getOrElse(Map.empty)
      case LessThan(Literal(v, _), a: Attribute) =>
        lit(v).map(l => if (l < Long.MaxValue) range(a.name, l + 1, Long.MaxValue) else range(a.name, 1L, 0L)).getOrElse(Map.empty)
      case GreaterThan(Literal(v, _), a: Attribute) =>
        lit(v).map(l => if (l > Long.MinValue) range(a.name, Long.MinValue, l - 1) else range(a.name, 1L, 0L)).getOrElse(Map.empty)
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val ls = vs.map { case Literal(v, _) => lit(v) }
        if (ls.forall(_.isDefined)) range(a.name, ls.flatten.min, ls.flatten.max)
        else Map.empty
      // pre-analysis shape only: the parser leaves `a BETWEEN lo AND hi`
      // as a function call (analysis later rewrites it to And(>=, <=),
      // which the cases above already serve on the resolved path)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("between") =>
        f.arguments match {
          case Seq(a: Attribute, Literal(lo, _), Literal(hi, _)) =>
            (lit(lo), lit(hi)) match {
              case (Some(l), Some(h)) => range(a.name, l, h)
              case _ => Map.empty
            }
          case _ => Map.empty
        }
      case And(l, r) => intersect(bounds(l), bounds(r))
      case _ => Map.empty
    }
  }

  def intersect(
      a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] =
    (a.keySet ++ b.keySet).map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((lo1, hi1)), Some((lo2, hi2))) => k -> (math.max(lo1, lo2), math.min(hi1, hi2))
        case (Some(r), None) => k -> r
        case (None, Some(r)) => k -> r
        case _ => throw new IllegalStateException("unreachable")
      }
    }.toMap

  // ---- DOUBLE bounds (closed [lo, hi], widened) --------------------
  //
  // Every literal maps to a closed double interval CONTAINING it:
  // exact for Double/Float and for integrals within 2^53; padded one
  // ulp each side when a conversion may round (big longs, decimals).
  // No strict-inequality sharpening — a closed superset is always
  // sound, and the exact predicate still runs in the scan. NaN
  // literals derive nothing (a NaN bound could never prune soundly
  // under Spark's NaN-above-everything ordering).

  /** The closed double interval containing one literal value. */
  private def dlit(v: Any): Option[(Double, Double)] = v match {
    case d: Double => if (d.isNaN) None else Some((d, d))
    case f: Float => if (f.isNaN) None else Some((f.toDouble, f.toDouble))
    case i: Int => Some((i.toDouble, i.toDouble))
    case s: Short => Some((s.toDouble, s.toDouble))
    case b: Byte => Some((b.toDouble, b.toDouble))
    case l: Long =>
      val d = l.toDouble
      if (l.abs <= (1L << 53)) Some((d, d))
      else Some((math.nextDown(d), math.nextUp(d)))
    case d: java.math.BigDecimal =>
      val x = d.doubleValue
      if (x.isInfinite) None else Some((math.nextDown(x), math.nextUp(x)))
    case d: org.apache.spark.sql.types.Decimal =>
      val x = d.toDouble
      if (x.isInfinite) None else Some((math.nextDown(x), math.nextUp(x)))
    case _ => None
  }

  def dblBounds(e: Expression): Map[String, (Double, Double)] = {
    val inf = Double.PositiveInfinity
    def lower(a: String, v: Any) = dlit(v).map(r => Map(a -> (r._1, inf))).getOrElse(Map.empty)
    def upper(a: String, v: Any) = dlit(v).map(r => Map(a -> (-inf, r._2))).getOrElse(Map.empty)
    e match {
      case EqualTo(a: Attribute, Literal(v, _)) => dlit(v).map(r => Map(a.name -> r)).getOrElse(Map.empty)
      case EqualTo(Literal(v, _), a: Attribute) => dlit(v).map(r => Map(a.name -> r)).getOrElse(Map.empty)
      case GreaterThan(a: Attribute, Literal(v, _)) => lower(a.name, v)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) => lower(a.name, v)
      case LessThan(a: Attribute, Literal(v, _)) => upper(a.name, v)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) => upper(a.name, v)
      case LessThan(Literal(v, _), a: Attribute) => lower(a.name, v)
      case LessThanOrEqual(Literal(v, _), a: Attribute) => lower(a.name, v)
      case GreaterThan(Literal(v, _), a: Attribute) => upper(a.name, v)
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) => upper(a.name, v)
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val rs = vs.map { case Literal(v, _) => dlit(v) }
        if (rs.forall(_.isDefined)) Map(a.name -> (rs.flatten.map(_._1).min, rs.flatten.map(_._2).max))
        else Map.empty
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("between") =>
        f.arguments match {
          case Seq(a: Attribute, Literal(lo, _), Literal(hi, _)) =>
            (dlit(lo), dlit(hi)) match {
              case (Some(l), Some(h)) => Map(a.name -> (l._1, h._2))
              case _ => Map.empty
            }
          case _ => Map.empty
        }
      case And(l, r) => dblIntersect(dblBounds(l), dblBounds(r))
      case _ => Map.empty
    }
  }

  def dblIntersect(
      a: Map[String, (Double, Double)],
      b: Map[String, (Double, Double)]): Map[String, (Double, Double)] =
    (a.keySet ++ b.keySet).map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((lo1, hi1)), Some((lo2, hi2))) => k -> (math.max(lo1, lo2), math.min(hi1, hi2))
        case (Some(r), None) => k -> r
        case (None, Some(r)) => k -> r
        case _ => throw new IllegalStateException("unreachable")
      }
    }.toMap

  // ---- STRING bounds (possibly one-sided, unsigned-lex byte space) --

  import graft.core.Skipping.{StrBound, StrRange}

  private def slit(v: Any): Option[Seq[Byte]] = v match {
    case u: UTF8String => Some(u.getBytes.toSeq)
    case s: String => Some(s.getBytes("UTF-8").toSeq)
    case _ => None
  }

  /** The least strict upper bound of every byte string with prefix `p`:
    * increment the last non-0xFF byte, drop the tail (all-0xFF ⇒ none). */
  private[sources] def prefixUpper(p: Seq[Byte]): Option[Seq[Byte]] = {
    val a = p.toArray
    var i = a.length - 1
    while (i >= 0 && a(i) == 0xff.toByte) i -= 1
    if (i < 0) None
    else {
      val out = a.take(i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out.toSeq)
    }
  }

  def strBounds(e: Expression): Map[String, StrRange] = {
    def one(a: String, r: StrRange) = Map(a -> r)
    def loB(b: Seq[Byte], incl: Boolean) = StrRange(Some(StrBound(b, incl)), None)
    def hiB(b: Seq[Byte], incl: Boolean) = StrRange(None, Some(StrBound(b, incl)))
    e match {
      case EqualTo(a: Attribute, Literal(v, _)) =>
        slit(v).map(b => one(a.name, StrRange(Some(StrBound(b, true)), Some(StrBound(b, true))))).getOrElse(Map.empty)
      case EqualTo(Literal(v, _), a: Attribute) =>
        slit(v).map(b => one(a.name, StrRange(Some(StrBound(b, true)), Some(StrBound(b, true))))).getOrElse(Map.empty)
      case GreaterThan(a: Attribute, Literal(v, _)) =>
        slit(v).map(b => one(a.name, loB(b, incl = false))).getOrElse(Map.empty)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
        slit(v).map(b => one(a.name, loB(b, incl = true))).getOrElse(Map.empty)
      case LessThan(a: Attribute, Literal(v, _)) =>
        slit(v).map(b => one(a.name, hiB(b, incl = false))).getOrElse(Map.empty)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
        slit(v).map(b => one(a.name, hiB(b, incl = true))).getOrElse(Map.empty)
      case GreaterThan(Literal(v, _), a: Attribute) =>
        slit(v).map(b => one(a.name, hiB(b, incl = false))).getOrElse(Map.empty)
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
        slit(v).map(b => one(a.name, hiB(b, incl = true))).getOrElse(Map.empty)
      case LessThan(Literal(v, _), a: Attribute) =>
        slit(v).map(b => one(a.name, loB(b, incl = false))).getOrElse(Map.empty)
      case LessThanOrEqual(Literal(v, _), a: Attribute) =>
        slit(v).map(b => one(a.name, loB(b, incl = true))).getOrElse(Map.empty)
      // col LIKE 'p%' reaches the data filters as StartsWith: the
      // matching set is exactly [p, prefixUpper(p))
      case StartsWith(a: Attribute, Literal(v, _)) =>
        slit(v).map { b =>
          one(a.name, StrRange(Some(StrBound(b, true)),
            prefixUpper(b).map(StrBound(_, false))))
        }.getOrElse(Map.empty)
      case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val bs = vs.map { case Literal(v, _) => slit(v) }
        if (bs.forall(_.isDefined)) {
          val sorted = bs.flatten.sortWith(graft.core.Skipping.compareBytes(_, _) < 0)
          one(a.name, StrRange(Some(StrBound(sorted.head, true)), Some(StrBound(sorted.last, true))))
        } else Map.empty
      // pre-analysis shape (DML victim selection parses unresolved)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("between") =>
        f.arguments match {
          case Seq(a: Attribute, Literal(lo, _), Literal(hi, _)) =>
            (slit(lo), slit(hi)) match {
              case (Some(l), Some(h)) => one(a.name,
                StrRange(Some(StrBound(l, true)), Some(StrBound(h, true))))
              case _ => Map.empty
            }
          case _ => Map.empty
        }
      case And(l, r) => strIntersect(strBounds(l), strBounds(r))
      case _ => Map.empty
    }
  }

  def strIntersect(
      a: Map[String, StrRange], b: Map[String, StrRange]): Map[String, StrRange] =
    (a.keySet ++ b.keySet).map { k =>
      (a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => k -> x.intersect(y)
        case (Some(r), None) => k -> r
        case (None, Some(r)) => k -> r
        case _ => throw new IllegalStateException("unreachable")
      }
    }.toMap

  // ---- NULL requirements (IS NULL / IS NOT NULL conjuncts) ---------
  //
  // Values: the set of nullness states the conjuncts allow — a
  // two-element set means `col IS NULL AND col IS NOT NULL`, provably
  // empty. `IsNotNull` is Catalyst-injected for every comparison, so
  // the non-null requirement prunes any ALL-null file for free.
  def nullBounds(e: Expression): Map[String, Set[Boolean]] = e match {
    case IsNull(a: Attribute) => Map(a.name -> Set(true))
    case IsNotNull(a: Attribute) => Map(a.name -> Set(false))
    case And(l, r) => nullIntersect(nullBounds(l), nullBounds(r))
    case _ => Map.empty
  }

  def nullIntersect(
      a: Map[String, Set[Boolean]], b: Map[String, Set[Boolean]]): Map[String, Set[Boolean]] =
    (a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, Set.empty) ++ b.getOrElse(k, Set.empty))
    }.toMap
}
