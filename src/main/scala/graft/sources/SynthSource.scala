package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-events source — the custom-source tier of the
  * engine (`spark.read.format("graft.sources.SynthSource")`), exercising
  * the two pushdown seams a real connector lives by:
  *
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): readers emit only
  *    the projected columns — a `select(type)` never materializes values.
  *  - FILTER PUSHDOWN with PARTITION PRUNING (`SupportsPushDownFilters`):
  *    range predicates on the sorted `id` column prune whole input
  *    partitions at PLANNING time (each partition covers a contiguous id
  *    range), the DSv2 analogue of parquet partition/row-group pruning.
  *    Pushed range filters are also fully applied per-row by the reader,
  *    so they are not re-evaluated by Spark (`pushedFilters` returns them
  *    as accepted).
  *
  * Rows are a pure function of `id` (mixed-constant hash), so any slice of
  * the data is reproducible on any executor — retries, speculation, and
  * AQE re-reads are safe by construction, the same contract a 100 TB
  * object-store connector needs.
  *
  * Options: `rows` (default 1000), `partitions` (default 4).
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("etype", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val types = Array("click", "view", "scroll", "purchase")

  /** deterministic row content: a pure function of id */
  def etypeOf(id: Long): String = types((((id * 2654435761L) >>> 33) % types.length).toInt)
  def valueOf(id: Long): Double = ((id * 6364136223846793005L + 1442695040888963407L) >>> 40).toDouble / 1e3

  /** planning-time observability for the spec: partitions created by the
    * most recent scan (pruning proof) */
  val lastPlannedPartitions = new AtomicInteger(-1)
}

private class SynthTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synth($rows rows, $partitions parts)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

private class SynthScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = SynthSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** accept id-range filters (fully applied source-side); reject the rest
    * back to Spark */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
          LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SynthScan(rows, partitions, required, pushed)
}

private class SynthScan(rows: Long, partitions: Int, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthScan PushedFilters: [${pushed.mkString(", ")}], ReadSchema: ${required.simpleString}"

  /** tightest id range implied by the pushed filters */
  private def idBounds: (Long, Long) = {
    var lo = 0L
    var hi = rows - 1
    pushed.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v)
      case _                                 => ()
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = idBounds
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    val parts = (0 until partitions).flatMap { p =>
      val start = p * per
      val end = math.min(rows, start + per) - 1
      // partition pruning: skip partitions disjoint from the pushed range
      if (end < lo || start > hi) None
      else Some(SynthPartition(math.max(start, lo), math.min(end, hi)): InputPartition)
    }.toArray
    SynthSource.lastPlannedPartitions.set(parts.length)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = new SynthReaderFactory(required)
}

private case class SynthPartition(from: Long, to: Long) extends InputPartition

private class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var id = p.from - 1
      private val cols = required.fieldNames
      override def next(): Boolean = { id += 1; id <= p.to }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id"    => id
          case "etype" => UTF8String.fromString(SynthSource.etypeOf(id))
          case "value" => SynthSource.valueOf(id)
        })
      override def close(): Unit = ()
    }
  }
}
