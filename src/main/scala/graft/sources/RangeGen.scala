package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 connector — a deterministic row GENERATOR with
  * real pushdown, the connector-side counterpart of the reference's
  * in-memory demo source (SURVEY §2 S1,
  * jar/ProfileJob.java:86-103): rows are a pure function of `id`
  * (`bucket = id % 97`, `value = (id·2654435761) % 1000000007` — both
  * reproducible as plain SQL, which is what makes the oracle
  * possible), so the source doubles as a zero-I/O scale harness.
  *
  * What it demonstrates is the V2 integration surface, each piece
  * spec-pinned (RangeGenSpec):
  *
  *  - '''filter pushdown''' ([[SupportsPushDownFilters]]): id-range
  *    predicates (`>= > <= < =`) narrow the generated span INSIDE the
  *    source — `pushedFilters` reports them handled, Spark drops its
  *    residual Filter node, and the scan never materializes a row
  *    outside the range;
  *  - '''partition pruning''': the full span splits into fixed-width
  *    slices ([[RangeGen.SliceRows]] ids each) and only slices
  *    overlapping the pushed range become [[InputPartition]]s — a
  *    10% id-range scan plans ~10% of the partitions, the
  *    generator-side analogue of parquet row-group skipping;
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): the
  *    reader computes exactly the pruned schema's columns, in the
  *    pruned order.
  *
  * Usage: `spark.read.format("graft.sources.RangeGen")
  * .option("rows", n).load()`. */
class RangeGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeGen.Schema
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeGenTable(
      Option(properties.get("rows")).map(_.toLong)
        .getOrElse(RangeGen.DefaultRows))
}

object RangeGen {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("value", LongType, nullable = false)))
  val DefaultRows = 1000000L
  /** Fixed slice width: partition count scales with the PUSHED span,
    * making pruning observable (and testable) as a partition count. */
  val SliceRows = 65536L

  def bucketOf(id: Long): Long = id % 97L
  def valueOf(id: Long): Long = (id * 2654435761L) % 1000000007L
}

private[sources] class RangeGenTable(rows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range_gen($rows)"
  override def schema(): StructType = RangeGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeGenScanBuilder(rows)
}

private[sources] class RangeGenScanBuilder(rows: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L // inclusive
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var schema = RangeGen.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, rest) = filters.partition {
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case EqualTo("id", _: java.lang.Long) => true
      case _ => false
    }
    handled.foreach {
      case GreaterThanOrEqual(_, v: java.lang.Long) =>
        lo = math.max(lo, v.longValue)
      case GreaterThan(_, v: java.lang.Long) =>
        lo = math.max(lo, v.longValue + 1)
      case LessThanOrEqual(_, v: java.lang.Long) =>
        hi = math.min(hi, v.longValue + 1)
      case LessThan(_, v: java.lang.Long) =>
        hi = math.min(hi, v.longValue)
      case EqualTo(_, v: java.lang.Long) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    pushed = handled
    rest // residual filters Spark must still apply (none of ours)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    schema = requiredSchema

  override def build(): Scan =
    new RangeGenScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)),
      schema)
}

private[sources] class RangeGenScan(lo: Long, hi: Long,
    prunedSchema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range_gen[$lo, $hi) cols=${prunedSchema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val w = RangeGen.SliceRows
    // only slices overlapping the PUSHED range — partition pruning
    val first = lo / w
    val last = if (hi <= lo) first - 1 else (hi - 1) / w
    (first to last).map { s =>
      RangeGenPartition(math.max(lo, s * w), math.min(hi, (s + 1) * w))
        : InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeGenReaderFactory(prunedSchema.fieldNames)
}

private[sources] case class RangeGenPartition(lo: Long, hi: Long)
    extends InputPartition

private[sources] class RangeGenReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeGenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.lo - 1
      override def next(): Boolean = { id += 1; id < p.hi }
      override def get(): InternalRow = {
        val vals = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) {
          vals(i) = cols(i) match {
            case "id" => id
            case "bucket" => RangeGen.bucketOf(id)
            case "value" => RangeGen.valueOf(id)
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
