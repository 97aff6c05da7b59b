package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source generating a deterministic synthetic corpus
  * — `spark.read.format("graft-synth").option("rows", n)
  * .option("partitions", p).load()`.
  *
  * Demonstrates the full connector read path: `TableProvider` →
  * `ScanBuilder` (with COLUMN PRUNING via SupportsPushDownRequiredColumns
  * — unrequested columns are never generated — and FILTER PUSHDOWN via
  * SupportsPushDownFilters — id-range predicates clamp the generated
  * range, non-range filters come back as residuals) → `Batch` splitting
  * the row range into `partitions` independent `InputPartition`s →
  * per-partition `PartitionReader`s that stream rows without
  * materializing anything.
  * The generation rule is pure integer arithmetic on the row id, so a
  * DuckDB oracle can replay it exactly from `range(n)` — the correctness
  * gate covers the source like any operator.
  *
  * Schema: id BIGINT, bucket INT (= id % 16),
  * val DOUBLE (= (id * 2654435761) % 1e6 / 1e6),
  * text STRING (= "tok<id%101> tok<id%97> tok<id%89>").
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false)))

  @inline def bucketOf(id: Long): Int = (id % 16).toInt
  @inline def valOf(id: Long): Double = ((id * 2654435761L) % 1000000L).toDouble / 1e6
  @inline def textOf(id: Long): String = s"tok${id % 101} tok${id % 97} tok${id % 89}"
}

final class SynthTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows, $partitions)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

final class SynthScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = SynthSource.schema
  private var lo: Long = 0L
  private var hi: Long = rows // generated id range is [lo, hi)
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // generation order is fixed; keep only the requested fields
    required = StructType(SynthSource.schema.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** FILTER PUSHDOWN: range predicates on `id` clamp the generation
    * range itself — pushed rows are never generated at all (the
    * connector analogue of parquet row-group pruning). Anything not a
    * simple id-range comparison is returned as a residual for Spark to
    * evaluate post-scan, so semantics never depend on what got pushed. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val residual = filters.filter {
      case sources.GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); false
      case sources.GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); false
      case sources.LessThan("id", v: Long) => hi = math.min(hi, v); false
      case sources.LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); false
      case sources.EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); false
      case _ => true
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan =
    new SynthScan(lo, math.max(lo, hi), partitions, required)
}

final class SynthScan(lo: Long, hi: Long, partitions: Int, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaces the clamped range in explain() output, so pushdown is
  // visible (and assertable) on the physical plan
  override def description(): String = s"graft-synth range=[$lo,$hi)"
  override def planInputPartitions(): Array[InputPartition] = {
    val p = math.max(1, partitions)
    val n = hi - lo
    (0 until p).map { i =>
      SynthRange(lo + n * i / p, lo + n * (i + 1) / p): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

case class SynthRange(start: Long, end: Long) extends InputPartition

final class SynthReaderFactory(fields: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRange]
    // resolve field names to column codes ONCE — get() is the hot loop
    // and must not pattern-match strings or re-resolve per row
    val codes: Array[Int] = fields.map {
      case "id" => 0
      case "bucket" => 1
      case "val" => 2
      case "text" => 3
    }
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      private val vals = new Array[Any](codes.length)
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow = {
        var i = 0
        while (i < codes.length) {
          vals(i) = codes(i) match {
            case 0 => cur: java.lang.Long
            case 1 => SynthSource.bucketOf(cur): java.lang.Integer
            case 2 => SynthSource.valOf(cur): java.lang.Double
            case 3 => UTF8String.fromString(SynthSource.textOf(cur))
          }
          i += 1
        }
        new GenericInternalRow(vals.clone())
      }
      override def close(): Unit = ()
    }
  }
}
