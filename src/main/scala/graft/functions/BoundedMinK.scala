package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k of a LONG column as a native Catalyst
  * `TypedImperativeAggregate` — the bounded-state exact twin of
  * `slice(array_sort(collect_list(x)), 1, k)`.
  *
  * Why it exists (SURVEY §2.22, q_inverted_index): capping a posting
  * list at the k smallest doc_ids with a window `row_number` costs a
  * per-token SORT of the full posting list — a single-task skew hazard
  * on stopword-grade hub tokens (one token can own a corpus-sized
  * partition at 100 TB), and `collect_list` holds the full list in the
  * aggregation buffer. This aggregate keeps exactly k longs per group,
  * updates in O(k) (k is small and fixed), merges map-side like any
  * mergeable aggregate, and ships k·partitions entries over the wire
  * regardless of row count. The result is deterministic (the k smallest
  * values, emitted ascending) under ANY partitioning, so queries built
  * on it stay oracle-checkable.
  *
  * Duplicates are kept (bottom-k of a multiset); feed it pre-distinct
  * input when set semantics are wanted. Nulls are skipped. */
case class BoundedMinK(
    child: Expression,
    k: Int = 10,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinK.Buffer] {

  import BoundedMinK.Buffer

  override def createAggregationBuffer(): Buffer =
    new Buffer(new Array[Long](k), 0)

  private def insert(buf: Buffer, v: Long): Unit = {
    if (buf.size < k) {
      buf.vals(buf.size) = v
      buf.size += 1
    } else {
      // replace the current maximum if v beats it; linear scan is the
      // right structure at k ~ 10 (beats heap constant factors)
      var mi = 0
      var i = 1
      while (i < buf.size) {
        if (buf.vals(i) > buf.vals(mi)) mi = i
        i += 1
      }
      if (v < buf.vals(mi)) buf.vals(mi) = v
    }
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    var i = 0
    while (i < b.size) { insert(a, b.vals(i)); i += 1 }
    a
  }

  override def eval(buf: Buffer): Any =
    new GenericArrayData(
      buf.vals.take(buf.size).sorted.map(v => v: Any))

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val size = bb.getInt()
    val vals = new Array[Long](k)
    var i = 0
    while (i < size) { vals(i) = bb.getLong(); i += 1 }
    new Buffer(vals, size)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bounded_min_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedMinK =
    copy(child = newChildren.head)
}

object BoundedMinK {
  /** Fixed-capacity bottom-k state: k slots, `size` of them live. */
  final class Buffer(val vals: Array[Long], var size: Int)

  /** Column-level entry point:
    * `agg(BoundedMinK.minK(col, k))` → array<long> ascending. */
  def minK(c: Column, k: Int = 10): Column =
    org.apache.spark.sql.GraftSql.column(
      BoundedMinK(org.apache.spark.sql.GraftSql.expression(c), k)
        .toAggregateExpression())
}
