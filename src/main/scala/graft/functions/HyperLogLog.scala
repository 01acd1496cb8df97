package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` (SURVEY §2.13 — the custom-aggregate tier
  * below codegen Expressions and above typed Aggregators).
  *
  * 2^p byte registers; update is max-per-register, so the aggregate is
  * fully partial-mergeable (Catalyst plans the usual partial/final split:
  * each executor folds its partitions into one 4 KiB buffer and only
  * buffers cross the wire — at 100 TB the shuffle is p·partitions bytes,
  * independent of row count) and ORDER-INDEPENDENT: the estimate is
  * identical for any partitioning of the input, unlike a sampled or
  * streaming-quantile sketch. Deterministic (fixed-seed XxHash64, the same
  * hash the engine's own hash() exposes).
  *
  * This is the from-first-principles twin of the built-in HLL++
  * `approx_count_distinct` (used by q_approx_distinct); kept separate so
  * the library demonstrates the native-aggregate extension path with
  * exact control of the sketch layout.
  */
case class HyperLogLog(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rank =
        if (w == 0) (64 - p + 1).toByte
        else (java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
      if (rank > buf(idx)) buf(idx) = rank
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    var e = alpha * m.toDouble * m.toDouble / sum
    if (e <= 2.5 * m && zeros > 0)
      e = m * math.log(m.toDouble / zeros) // small-range correction
    math.rint(e).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll"

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HyperLogLog =
    copy(child = newChildren.head)
}

object HyperLogLog {
  /** Column-level entry point: `agg(HyperLogLog.approxDistinct(col))`. */
  def approxDistinct(c: Column, p: Int = 12): Column =
    org.apache.spark.sql.GraftSql.column(
      HyperLogLog(org.apache.spark.sql.GraftSql.expression(c), p)
        .toAggregateExpression())
}
