package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/** Column-mapping bridge for the native parquet scan: the ENGINE plans
  * with the table's LOGICAL column names, the FILES hold the frozen
  * PHYSICAL ones (jobs/Snapshots column mapping — rename/drop without
  * rewriting data). `InternalRow`s are positional, so translating the
  * requested schema's NAMES (types unchanged) before delegating to the
  * stock `ParquetFileFormat` is the complete fix — the vectorized
  * reader, whole-stage codegen and row-group pushdown all ride along
  * untouched. Pushed-down filters are translated the same way; a filter
  * shape we don't translate is DROPPED from the pushdown (sound — the
  * engine re-evaluates every data filter above the scan anyway).
  * Identity mappings short-circuit to the parent. */
private[sources] class MappedParquetFileFormat(logicalToPhysical: Map[String, String])
  extends ParquetFileFormat {

  private def phys(n: String): String = logicalToPhysical.getOrElse(n, n)

  private def translate(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = phys(f.name))))

  private def translateFilter(f: sources.Filter): Option[sources.Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
    case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(phys(a), v))
    case sources.GreaterThan(a, v) => Some(sources.GreaterThan(phys(a), v))
    case sources.GreaterThanOrEqual(a, v) => Some(sources.GreaterThanOrEqual(phys(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
    case sources.LessThanOrEqual(a, v) => Some(sources.LessThanOrEqual(phys(a), v))
    case sources.In(a, vs) => Some(sources.In(phys(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
    case sources.StringStartsWith(a, v) => Some(sources.StringStartsWith(phys(a), v))
    case sources.StringEndsWith(a, v) => Some(sources.StringEndsWith(phys(a), v))
    case sources.StringContains(a, v) => Some(sources.StringContains(phys(a), v))
    case sources.And(l, r) =>
      for (lt <- translateFilter(l); rt <- translateFilter(r)) yield sources.And(lt, rt)
    case sources.Or(l, r) =>
      for (lt <- translateFilter(l); rt <- translateFilter(r)) yield sources.Or(lt, rt)
    case sources.Not(c) => translateFilter(c).map(sources.Not)
    case _ => None // unknown shape: don't push it, never mistranslate it
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[sources.Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(
      sparkSession,
      translate(dataSchema),
      partitionSchema, // partition columns are never renamed (path-encoded)
      translate(requiredSchema),
      filters.flatMap(translateFilter),
      options,
      hadoopConf)

  override def toString: String = "Parquet(column-mapped)"
}
