package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style partition layout codec for the snapshot log (jobs/
  * Snapshots): partition VALUES ride the data-file paths the log already
  * names (`data/commit-7-ab12cd34/year=2024/month=1/part-….parquet`) —
  * the same self-describing layout the reference's own parquet store
  * uses (ref `scripts/02_spark_etl.py:140-144`,
  * `partitionBy("year","month")`) and the one Spark's writer emits, so
  * the delta needs no second encoding of them. Which columns ARE
  * partition columns is a table property (`graft.partitionBy`), recorded
  * at init and carried by every commit like any other property.
  *
  * Values are escaped by Spark's writer exactly like Hive
  * (`%XX` percent-escapes for path-hostile characters, nulls as
  * `__HIVE_DEFAULT_PARTITION__`); `valuesOf` reverses both. Typed values
  * are recovered by casting the path string through Catalyst `Cast`
  * under the UTC session convention — the inverse of the writer's
  * string rendering for the integral/string/date types partition
  * columns sensibly take. */
object HivePartitions {

  /** Table property naming the partition columns, comma-separated in
    * layout order. Absent/empty = unpartitioned table. */
  val prop = "graft.partitionBy"

  def columnsOf(props: Map[String, String]): Seq[String] =
    props.get(prop).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  /** The logical schema split into (data files' schema, partition
    * schema) — partitioned parquet files do NOT contain the partition
    * columns; they live in the path. Partition schema keeps the
    * property's layout order; data schema keeps the logical order. */
  def splitSchema(full: StructType, partCols: Seq[String]): (StructType, StructType) = {
    val byName = full.fields.map(f => f.name -> f).toMap
    val missing = partCols.filterNot(byName.contains)
    require(missing.isEmpty,
      s"partition column(s) ${missing.mkString(", ")} not in table schema " +
        s"${full.fieldNames.mkString(", ")}")
    val part = StructType(partCols.map(byName(_)))
    val data = StructType(full.fields.filterNot(f => partCols.contains(f.name)))
    (data, part)
  }

  private val hiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Hive `unescapePathName`: reverse the writer's %XX escapes. */
  private def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The `k=v` fragments of one file's (relative or absolute) path, as
    * raw strings (None = hive default partition, i.e. null). Only
    * fragments for columns in `partCols` are returned — a value that
    * happens to contain `=` can't confuse the parse because the writer
    * escapes `=` in values. */
  def valuesOf(path: String, partCols: Seq[String]): Map[String, Option[String]] = {
    val want = partCols.toSet
    path.split('/').iterator
      .filter(_.contains('='))
      .map { seg =>
        val i = seg.indexOf('=')
        unescape(seg.take(i)) -> unescape(seg.drop(i + 1))
      }
      .filter { case (k, _) => want(k) }
      .map { case (k, v) =>
        k -> (if (v == hiveDefaultPartition) None else Some(v))
      }
      .toMap
  }

  /** The typed partition-values row of one file path under
    * `partitionSchema` — the `InternalRow` a `PartitionDirectory`
    * carries, so Catalyst evaluates partition filters and materializes
    * partition columns without touching the file.
    *
    * `timeZoneId` must be the SESSION timezone
    * (`spark.sessionState.conf.sessionLocalTimeZone`): Spark's writer
    * renders partition values — and `Snapshots.filePartitionsFrame`
    * casts them back — under the session zone, so decoding under any
    * other zone would shift timestamp-typed partition values and make
    * plan-time pruning silently drop matching partitions. */
  def internalRowOf(path: String, partitionSchema: StructType,
      timeZoneId: String): InternalRow =
    internalRowOfValues(
      valuesOf(path, partitionSchema.fieldNames.toSeq), partitionSchema, timeZoneId)

  /** The typed row for already-parsed raw partition values — split out
    * so a caller grouping MANY paths can cast once per DISTINCT
    * partition instead of per file: each `Cast(...).eval` allocates and
    * resolves a fresh expression (~tens of µs), which at 10⁵–10⁷
    * planned files was the dominant plan-time cost on partitioned
    * tables (the r16 partsc plan_sel gap). */
  def internalRowOfValues(raw: Map[String, Option[String]],
      partitionSchema: StructType, timeZoneId: String): InternalRow = {
    val values = partitionSchema.fields.map { f =>
      raw.getOrElse(f.name, None) match {
        case None => null
        case Some(s) =>
          Cast(Literal(UTF8String.fromString(s), StringType), f.dataType,
            Some(timeZoneId)).eval(null)
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
}
