package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: at most k (value, id) pairs, kept sorted
  * best-first. Better = higher value; ties → smaller id (total order, so
  * results are deterministic). k is query-level small (5..100), so
  * insertion into a sorted array beats heap bookkeeping.
  */
final class BoundedTopK(val k: Int) {
  val values = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def better(v: Double, id: Long, i: Int): Boolean =
    v > values(i) || (v == values(i) && id < ids(i))

  def add(v: Double, id: Long): Unit = {
    if (size == k && !better(v, id, k - 1)) return
    var pos = if (size < k) size else k - 1
    while (pos > 0 && better(v, id, pos - 1)) {
      values(pos) = values(pos - 1); ids(pos) = ids(pos - 1)
      pos -= 1
    }
    values(pos) = v; ids(pos) = id
    if (size < k) size += 1
  }

  def merge(o: BoundedTopK): Unit = {
    var i = 0
    while (i < o.size) { add(o.values(i), o.ids(i)); i += 1 }
  }
}

/** Exact per-group top-k as a custom `TypedImperativeAggregate`.
  *
  * The stock Spark idiom (window `row_number() <= k`) shuffles EVERY row
  * to its group's reducer and sorts there; this aggregate gets map-side
  * partial aggregation, so each map task ships at most k rows per group
  * — at 100 TB the shuffle drops from O(rows) to O(groups·k·tasks).
  * Output: array<struct<value,event-id>> sorted best-first.
  *
  * Contract: rows with a NULL value or id are SKIPPED (like SQL
  * aggregates; a window row_number replay must filter `value IS NOT
  * NULL` to match), and values are expected non-NaN — [[BoundedTopK]]'s
  * ordering treats NaN as worst, whereas Spark's descending sort ranks
  * NaN first.
  *
  * DEPLOYMENT NOTE: typed aggregates plan as ObjectHashAggregate, which
  * silently falls back to SORT-based aggregation once a partition sees
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys — and the stock default is 128. For a wide-key top-k (many
  * groups per task) the fallback sorts the ENTIRE input, i.e. exactly
  * the O(rows·log rows) pass this aggregate exists to avoid. Jobs that
  * group by a high-cardinality key must raise the threshold; the
  * buffers here are ~16·k bytes per group, so millions of hashed groups
  * are cheap. The Bench/Verify mains (and the test session) set 4M.
  */
case class TopKByValue(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopK] {

  require(k > 0, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): BoundedTopK = new BoundedTopK(k)

  override def update(b: BoundedTopK, input: InternalRow): BoundedTopK = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      b.add(v.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: BoundedTopK, o: BoundedTopK): BoundedTopK = { b.merge(o); b }

  override def eval(b: BoundedTopK): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      out(i) = new GenericInternalRow(Array[Any](b.values(i), b.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: BoundedTopK): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.size * 16)
    buf.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.values(i)); buf.putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new BoundedTopK(buf.getInt())
    val n = buf.getInt()
    var i = 0
    // entries arrive best-first (serialized sorted) → add() is O(1) each
    while (i < n) { b.add(buf.getDouble(), buf.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByValue =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByValue =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByValue {
  /** Column API: `top_k_by(value, id, k)` → array<struct<value,id>>. */
  def top_k_by(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByValue(ColumnBridge.expression(value), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
